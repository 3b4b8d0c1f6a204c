"""TPU-native toy-crystals generative modelling framework.

Rebuilds the capabilities of the `toycrystals` reference package
(conditional VAE + latent diffusion prior + VP-SDE score model on a
synthetic periodic-lattice dataset) as an idiomatic JAX/Flax/Pallas stack:

- ``toycrystals_tpu.data``     — on-device procedural dataset (Pallas rasterizer)
- ``toycrystals_tpu.models``   — Flax models (CondVAE, diffusion prior, score U-Net)
- ``toycrystals_tpu.ops``      — TPU compute primitives (circular conv pads, attention)
- ``toycrystals_tpu.parallel`` — mesh / sharding helpers for multi-chip scale-out
- ``toycrystals_tpu.train``    — jitted train steps, train states, EMA
- ``toycrystals_tpu.utils``    — checkpointing, figures, metrics
"""

__version__ = "0.1.0"

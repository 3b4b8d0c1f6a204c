"""Conditional and unconditional convolutional VAEs (Flax linen, NHWC).

Same architecture contract as the reference
(`/root/reference/src/toycrystals/models/vae.py:8-134`):

- Encoder: 4x Conv(k4, s2, p1) + ReLU, 1->32->64->128->256 channels,
  64x64 -> 4x4 spatial; flatten, concat cond vec, FC 256 -> (mu, logvar).
- Cond vec: one_hot(y_cat, n_types) ++ y_cont (`vae.py:45-48`).
- Decoder: FC (z ++ y) -> 4x4x256, 4x ConvTranspose(k4, s2, p1) + ReLU,
  final sigmoid (`vae.py:33-43`).
- `cond_drop`: per-sample Bernoulli mask zeroing the whole cond vec in
  *decode only*, training only (`vae.py:65-67`).
- Free-bits KL helper matching `train_vae.py:17-36`.

TPU-first differences: NHWC layout, functional apply with explicit RNG
streams ('reparam' for the latent noise, 'cond_drop' for the mask), and a
`dtype` knob so forward math can run in bfloat16 on the MXU while params stay
float32.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_ENC_CH = (32, 64, 128, 256)
_DEC_CH = (128, 64, 32, 1)
_P1 = ((1, 1), (1, 1))


def _y_vec(y_cat: jax.Array, y_cont: jax.Array, n_types: int) -> jax.Array:
    """one_hot(y_cat) ++ y_cont (`vae.py:45-48`)."""
    y_oh = jax.nn.one_hot(y_cat, n_types, dtype=jnp.float32)
    return jnp.concatenate([y_oh, y_cont.astype(jnp.float32)], axis=1)


class _Encoder(nn.Module):
    z_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array | None) -> tuple[jax.Array, jax.Array]:
        h = x.astype(self.dtype)
        for ch in _ENC_CH:
            h = nn.Conv(ch, (4, 4), strides=(2, 2), padding=_P1, dtype=self.dtype)(h)
            h = nn.relu(h)
        h = h.reshape(h.shape[0], -1)
        if y is not None:
            h = jnp.concatenate([h, y.astype(self.dtype)], axis=1)
        h = nn.relu(nn.Dense(256, dtype=self.dtype)(h))
        mu = nn.Dense(self.z_dim, dtype=self.dtype, name="mu")(h)
        logvar = nn.Dense(self.z_dim, dtype=self.dtype, name="logvar")(h)
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)


class _Decoder(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, y: jax.Array | None) -> jax.Array:
        h = z.astype(self.dtype)
        if y is not None:
            h = jnp.concatenate([h, y.astype(self.dtype)], axis=1)
        h = nn.Dense(256 * 4 * 4, dtype=self.dtype)(h)
        h = h.reshape(-1, 4, 4, 256)
        for i, ch in enumerate(_DEC_CH):
            # SAME with k=4, s=2 pads (1,1) — identical to torch ConvTranspose2d
            # (k4, s2, p1), output 2x input (`vae.py:35-42`).
            h = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype)(h)
            h = nn.relu(h) if i < len(_DEC_CH) - 1 else nn.sigmoid(h)
        return h.astype(jnp.float32)


class CondVAE(nn.Module):
    """Conditional VAE (mirrors `vae.py:8-78`)."""

    z_dim: int = 16
    n_types: int = 4
    y_cont_dim: int = 4
    cond_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @property
    def y_dim(self) -> int:
        return self.n_types + self.y_cont_dim

    def setup(self) -> None:
        self.encoder = _Encoder(self.z_dim, dtype=self.dtype)
        self.decoder = _Decoder(dtype=self.dtype)

    def encode(self, x, y_cat, y_cont):
        return self.encoder(x, _y_vec(y_cat, y_cont, self.n_types))

    def reparameterise(self, mu, logvar):
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(self.make_rng("reparam"), std.shape, std.dtype)
        return mu + std * eps

    def decode(self, z, y_cat, y_cont, train: bool = False):
        y = _y_vec(y_cat, y_cont, self.n_types)
        if train and self.cond_drop > 0.0:
            # Per-sample mask zeroing the whole cond vec in decode (`vae.py:65-67`).
            keep = (
                jax.random.uniform(self.make_rng("cond_drop"), (y.shape[0], 1))
                >= self.cond_drop
            ).astype(y.dtype)
            y = y * keep
        return self.decoder(z, y)

    def __call__(self, x, y_cat, y_cont, train: bool = False):
        mu, logvar = self.encode(x, y_cat, y_cont)
        z = self.reparameterise(mu, logvar)
        x_hat = self.decode(z, y_cat, y_cont, train=train)
        return x_hat, mu, logvar


class VAE(nn.Module):
    """Unconditional VAE baseline (mirrors `vae.py:81-134`)."""

    z_dim: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.encoder = _Encoder(self.z_dim, dtype=self.dtype)
        self.decoder = _Decoder(dtype=self.dtype)

    def encode(self, x):
        return self.encoder(x, None)

    def reparameterise(self, mu, logvar):
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(self.make_rng("reparam"), std.shape, std.dtype)
        return mu + std * eps

    def decode(self, z):
        return self.decoder(z, None)

    def __call__(self, x, train: bool = False):
        mu, logvar = self.encode(x)
        z = self.reparameterise(mu, logvar)
        return self.decode(z), mu, logvar


def kl_stats(
    mu: jax.Array, logvar: jax.Array, free_bits: float = 0.0
) -> tuple[jax.Array, jax.Array]:
    """(kl_used_for_loss, kl_raw), batch-averaged, free bits in nats/dim
    (`train_vae.py:17-36`)."""
    kl_dim = 0.5 * (mu**2 + jnp.exp(logvar) - 1.0 - logvar)
    kl_raw = jnp.mean(jnp.sum(kl_dim, axis=1))
    if free_bits > 0.0:
        kl_used = jnp.mean(jnp.sum(jnp.maximum(kl_dim, free_bits), axis=1))
    else:
        kl_used = kl_raw
    return kl_used, kl_raw

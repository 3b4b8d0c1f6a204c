"""Cooperative preemption handling for training loops.

Preemptible/spot TPU pods deliver SIGTERM with a short grace window; the
reference has no story for this (a kill mid-epoch loses everything since the
last per-epoch `torch.save`, and `--ckpt-every N` widens that loss window to
N epochs). The TPU-native contract here:

- :class:`GracefulShutdown` latches SIGTERM/SIGINT into a flag instead of
  dying mid-dispatch (interrupting a donated fused-epoch program would leave
  the train state freed/corrupt — the epoch must complete).
- Trainers poll :attr:`requested` at epoch boundaries: on shutdown they save
  a checkpoint IMMEDIATELY (ignoring ``--ckpt-every`` cadence), skip optional
  diagnostics (sample grids), print a resume hint, and exit 0 — so a
  preempted run resumes exactly where it stopped via the existing
  ``--resume`` path.
- A second signal escalates to the default handler (hard kill escape hatch
  if the current epoch itself hangs).

Used by all three trainers and the distillation script.
"""

from __future__ import annotations

import signal


class GracefulShutdown:
    """Context manager latching SIGTERM/SIGINT into a poll-able flag.

    >>> with GracefulShutdown() as stop:
    ...     for epoch in range(epochs):
    ...         state = epoch_fn(state)      # never interrupted mid-dispatch
    ...         if stop.requested:
    ...             save_checkpoint(...)     # cadence-independent save
    ...             break

    The first signal sets :attr:`requested` and records which signal; the
    second restores the default disposition and re-raises it (so a stuck
    epoch can still be killed). Handlers are restored on exit, and
    construction is a no-op off the main thread (signal.signal would throw).
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = tuple(signals)
        self._previous: dict = {}
        self.requested = False
        self.signame: str | None = None

    def _handler(self, signum, frame):
        if self.requested:  # second signal: escalate to the default action
            signal.signal(signum, signal.SIG_DFL)
            signal.raise_signal(signum)
            return
        self.requested = True
        self.signame = signal.Signals(signum).name
        # os.write to the raw fd, NOT print(): the handler interrupts the
        # main thread at an arbitrary bytecode — if that thread is mid-print,
        # a buffered-writer re-entry raises RuntimeError out of the training
        # loop and kills the run without the graceful checkpoint.
        import os

        os.write(2, (f"\n{self.signame} received — finishing the current "
                     "epoch, then checkpointing and exiting (send again to "
                     "kill now)\n").encode())

    def __enter__(self) -> "GracefulShutdown":
        for s in self._signals:
            try:
                self._previous[s] = signal.signal(s, self._handler)
            except ValueError:  # not the main thread (e.g. under a test runner)
                pass
        return self

    def __exit__(self, *exc) -> None:
        for s, prev in self._previous.items():
            signal.signal(s, prev)
        self._previous.clear()

"""Graceful-preemption handling for long training runs.

Production TPU slices are routinely preempted (maintenance events, spot/
preemptible reclamation): the scheduler delivers SIGTERM and grants a short
grace window before SIGKILL. The reference has no story for this — a
preempted run loses everything since its last per-epoch ``torch.save``
(main.py:128-136). Here every training CLI polls a :class:`GracefulShutdown`
once per step; on a signal the loop finishes the in-flight step, writes a
``preempt_<name>`` checkpoint in the normal resumable schema, and returns
cleanly, so ``-load_model true -checkpoint_name preempt_<name>`` continues
the run (the interrupted epoch is redone in full — the same epoch-grain
resume semantics the reference's crash-restart path has).

The first signal requests a graceful stop; a second one restores the
original handler and re-raises, so a stuck run can still be killed with the
usual double Ctrl-C / escalating-signal conventions.
"""

from __future__ import annotations

import signal
from typing import Optional, Sequence


class GracefulShutdown:
    """Context manager turning SIGTERM/SIGINT into a pollable flag.

    >>> with GracefulShutdown() as stop:
    ...     for batch in loader:
    ...         if stop.requested:
    ...             break  # caller saves a preempt checkpoint and returns
    """

    def __init__(self, signals: Sequence[int] = (signal.SIGTERM,
                                                 signal.SIGINT)):
        self._signals = tuple(signals)
        self._previous: dict = {}
        self.requested = False
        self.signum: Optional[int] = None

    def _handler(self, signum, frame):
        if self.requested:
            # second signal: the user/scheduler means it — restore the
            # original disposition and re-deliver. signal.getsignal returns
            # None for handlers installed outside Python; those can't be
            # re-installed, so fall back to the default disposition.
            prev = self._previous.get(signum) or signal.SIG_DFL
            signal.signal(signum, prev)
            signal.raise_signal(signum)
            return
        self.requested = True
        self.signum = signum
        print(f"[preempt] caught signal {signum}: finishing the current "
              f"step, then saving a resumable checkpoint", flush=True)

    def __enter__(self) -> "GracefulShutdown":
        for s in self._signals:
            try:
                self._previous[s] = signal.signal(s, self._handler)
            except ValueError:
                # not the main thread (e.g. a test harness): stay pollable,
                # never triggered by real signals
                pass
        return self

    def __exit__(self, *exc) -> None:
        for s, prev in self._previous.items():
            # None = the previous handler was installed outside Python and
            # cannot be re-installed; default is the closest restoration
            signal.signal(s, prev if prev is not None else signal.SIG_DFL)
        self._previous.clear()


class NullShutdown:
    """No-op stand-in so step loops can poll unconditionally."""

    requested = False
    signum = None


class CrossProcessShutdown:
    """Cross-process agreement wrapper around a pollable shutdown flag.

    :class:`GracefulShutdown` is per-process: under ``--distributed`` the
    scheduler may deliver SIGTERM to only some hosts. If ranks disagree, the
    signaled rank exits its step loop while the rest block forever at their
    next collective — and when the signaled rank is not process 0, the
    ``primary_host()``-gated preempt checkpoint is never written anywhere.

    Reading ``.requested`` through this wrapper performs a cross-process OR
    (a tiny all-gather), so every rank sees the same answer at the same poll
    and they all exit the loop together, with process 0 guaranteed to run
    the save. The result latches once True so later polls stay consistent
    without re-gathering. Every rank must poll at the same points the same
    number of times (the trainer loops are lockstep, so they do).
    """

    def __init__(self, inner):
        self._inner = inner
        self._agreed = False

    @property
    def requested(self) -> bool:
        if self._agreed:
            return True
        import numpy as np
        from jax.experimental import multihost_utils

        local = np.asarray(bool(self._inner.requested))
        self._agreed = bool(multihost_utils.process_allgather(local).any())
        return self._agreed

    @property
    def signum(self):
        # None on ranks that saw no local signal (the agreed stop may have
        # originated elsewhere); callers print it as-is.
        return self._inner.signum


def cross_process(shutdown):
    """Wrap ``shutdown`` for multi-host runs; identity on single-process.

    Trainer loops call this once after resolving their shutdown source, so
    single-process runs (and tests that monkeypatch a fake flag) pay zero
    overhead while ``--distributed`` runs get per-step rank agreement.
    ``NullShutdown`` stays unwrapped even multi-process: its flag is a class
    constant False on every rank, so the per-step allgather could never
    return True — callers that disabled preemption shouldn't pay a blocking
    DCN collective per step for it.
    """
    import jax

    if isinstance(shutdown, NullShutdown) or jax.process_count() == 1:
        return shutdown
    return CrossProcessShutdown(shutdown)

"""Graceful preemption handling (SURVEY §5.3, failure detection).

TPU pools and batch schedulers preempt with SIGTERM and a grace period
before SIGKILL. The reference (a single-machine research repo) loses
everything since its last periodic save; this rebuild converts the first
signal into a cooperative stop: the train loop finishes the in-flight
K-step dispatch, checkpoints at the EXACT interrupted step (the seekable
id schedule + dispatch_sizes make resume from any step O(1) and
K-stable), and returns normally so the CLI can report how to resume.

Multi-host: the stop decision is made collectively once per dispatch
(every process all-gathers its local flag and stops iff ANY process was
signaled), so the collective checkpoint save is entered by all processes
or none — a scheduler that signals hosts at slightly different times, or
only one host, cannot wedge the job in a half-entered save.
"""

from __future__ import annotations

import signal
import threading


class GracefulStop:
    """First SIGTERM/SIGINT → a cooperative ``requested`` flag.

    Use as a context manager around the training loop, in the process's
    MAIN thread (CPython restricts handler installation to it; entering
    from any other thread is a documented no-op — the flag simply never
    sets and training runs to completion).

    Escalation: handling the first delivery re-arms the signal with its
    PREVIOUS handler, so a second SIGTERM (a scheduler escalating before
    SIGKILL) or a second ^C behaves exactly as it would have without this
    guard — a wedged run can still be killed.
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = tuple(signals)
        self._prev: dict = {}
        self.requested = False

    def __enter__(self) -> "GracefulStop":
        if threading.current_thread() is threading.main_thread():
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._handle)
        return self

    def _handle(self, signum, frame) -> None:
        self.requested = True
        signal.signal(signum, self._prev.get(signum, signal.SIG_DFL))

    def __exit__(self, *exc) -> bool:
        # restore any handler the first delivery hasn't already restored
        for s, h in self._prev.items():
            if signal.getsignal(s) is self._handle:
                signal.signal(s, h)
        self._prev.clear()
        return False

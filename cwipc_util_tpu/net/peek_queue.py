"""A queue with non-destructive wait: dont_get() blocks until an item is
present without removing it (used by available(wait=True) implementations;
reference: python/cwipc/net/peek_queue.py:7-38)."""

from __future__ import annotations

import queue
import threading
from typing import Generic, Optional, TypeVar

T = TypeVar("T")


class PeekQueue(queue.Queue, Generic[T]):
    def __init__(self, maxsize: int = 0):
        super().__init__(maxsize)
        self._peek_cond = threading.Condition()

    def put(self, item, block: bool = True, timeout: Optional[float] = None) -> None:
        super().put(item, block, timeout)
        with self._peek_cond:
            self._peek_cond.notify_all()

    def dont_get(self, timeout: Optional[float] = None) -> Optional[T]:
        """Wait until an item is available and return it WITHOUT removing it.

        Returns None on timeout.
        """
        deadline = None
        if timeout is not None:
            import time

            deadline = time.time() + timeout
        while True:
            try:
                with self.mutex:
                    if self._qsize() > 0:
                        return self.queue[0]
            except Exception:
                pass
            with self._peek_cond:
                if deadline is not None:
                    import time

                    remaining = deadline - time.time()
                    if remaining <= 0:
                        return None
                    self._peek_cond.wait(remaining)
                else:
                    self._peek_cond.wait(0.1)

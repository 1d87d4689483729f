"""Background batch prefetch — the reference's DataLoader-worker analog.

PyG's ``DataLoader(num_workers=N)`` (reference main_zinc...py:223-225)
overlaps collate with the training step via worker processes.  Here a
single daemon thread is enough: the native packed collate
(data/fast_collate.py) releases the GIL inside its C calls, so collation of
batch k+1 genuinely runs while the interpreter dispatches step k, and the
device executes asynchronously under both.

    for batch in prefetch(loader, depth=2):
        state, loss = step(state, batch)

``depth`` bounds the queue so at most ``depth`` collated batches (tens of
MB each at flagship scale) are resident ahead of the consumer.  Exceptions
in the producer re-raise at the consumer's next ``__next__``.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_END = object()


def prefetch(batches: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Iterate ``batches`` on a daemon thread, ``depth`` items ahead."""
    if depth <= 0:
        yield from batches
        return
    q: queue.Queue = queue.Queue(maxsize=depth)

    def produce():
        try:
            for item in batches:
                q.put(item)
        except BaseException as exc:  # noqa: BLE001 - relayed to consumer
            q.put((_END, exc))
            return
        q.put((_END, None))

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        item = q.get()
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _END:
            if item[1] is not None:
                raise item[1]
            return
        yield item

"""Overlap independent driver-blocking actions (guide §2.6, r13).

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls
them sequentially.  The store builders in this repo end with 2-3
INDEPENDENT actions (write the bucket table, write the token/vector
table, write a stats row) — submitting them from a small thread pool
lets the next job's tasks back-fill executors freed by the current
job's tail instead of queueing behind its last straggler.

Driver-side only; results (when any) are returned in submission
order and the first exception propagates — identical failure
semantics to the sequential form.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor


def overlap_actions(
    thunks: Sequence[Callable[[], object]], max_workers: int = 2
) -> list:
    """Run the given zero-arg actions concurrently; return their
    results in submission order.  2-3 in flight is plenty: enough to
    fill a job's tail, not so many that they fight for executors."""
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]

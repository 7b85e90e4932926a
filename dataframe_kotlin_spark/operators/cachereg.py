"""Bounded, thread-safe retirement registry for persisted relations.

LRU eviction in Spark's block manager only moves MEMORY_AND_DISK blocks
memory->disk; the disk half lives until an explicit ``unpersist``, so a
long session that persists one relation per distinct input accumulates
local-disk blocks without bound (the r9 dedup finding, generalized to
the query-level persists the r9 review flagged in queries/pipeline.py).
Each family keeps a small FIFO of its live persisted frames here; when
the FIFO overflows, the oldest is unpersisted.

Thread-safety contract (ADVICE r9): the deque mutations are guarded by
a per-registry lock, so concurrent callers (a threaded harness driving
several queries at once) cannot corrupt the FIFO or double-evict. The
lock does NOT extend to Spark reads of an evicted frame — an in-flight
job whose base is retired mid-read silently recomputes (correctness is
unaffected; ``unpersist`` is always safe in Spark). Callers that need
a hard liveness window should size ``cap`` above their concurrency.
"""

from __future__ import annotations

import threading
from collections import deque


class PersistRegistry:
    """FIFO of persisted DataFrames; appending past ``cap`` unpersists
    the oldest. The newest entries stay cached so warm bench/scale reps
    still hit."""

    def __init__(self, cap: int = 4):
        self._cap = int(cap)
        self._lock = threading.Lock()
        self._items: deque = deque()

    def retain(self, df):
        """Register an already-persisted frame; evict beyond cap.
        Returns ``df`` so call sites stay one-liners."""
        evicted = []
        with self._lock:
            self._items.append(df)
            while len(self._items) > self._cap:
                evicted.append(self._items.popleft())
        for old in evicted:
            try:
                old.unpersist()
            except Exception:
                pass  # session already stopped: nothing to release
        return df

    def __len__(self) -> int:
        with self._lock:
            return len(self._items)


#: jaccard_pairs_prefix's (id, token-set) bases — see the persist
#: comment in operators/dedup.py.
PREFIX_BASE = PersistRegistry(cap=4)

#: query-level persists in queries/pipeline.py (IVF result frames, the
#: N-row frame-assignment map, the dsir pool). Cap 8: the heaviest
#: entry is one (id, cell) map per invocation; eight invocations of
#: narrow relations stay far under one corpus scan's footprint.
QUERY_RESULTS = PersistRegistry(cap=8)

#: the coarse router's persisted (fine cell -> chunk) maps — k rows of
#: two ints per distinct chunked model (operators/similarity.py
#: _coarse_layer). The memo dict keeps serving an evicted entry's
#: DataFrame handle; reads after eviction silently recompute.
COARSE_MAPS = PersistRegistry(cap=4)

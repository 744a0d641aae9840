"""Registry for persisted intermediates of lazily-returned operators.

Multi-pass operators (ngram_jaccard_pairs, minhash/simhash LSH,
duplicate_spans, collocations) persist a shared intermediate that both
branches of their plan read, then return a LAZY DataFrame — so they
cannot unpersist before the caller's action runs.  Each such persist is
registered here; long-lived sessions call `release_scratch()` after the
consuming action to drop the cache blocks (ADVICE r2: repeated pipeline
invocations otherwise leak storage across the session's lifetime).

Operators whose actions complete in-function (connected_components)
unpersist inline and do not appear here.
"""

from __future__ import annotations

_SCRATCH: list = []


def register(df):
    """Track a persisted DataFrame for later release; returns it."""
    _SCRATCH.append(df)
    return df


def release_scratch(blocking: bool = False) -> int:
    """Unpersist every registered intermediate; returns how many were
    released.  Safe to call at any time — operators re-persist on the
    next invocation."""
    n = 0
    while _SCRATCH:
        df = _SCRATCH.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    return n

"""The 33-word English stop set used by StandardAnalyzer/StopAnalyzer.

Set contents from ``lucene/analysis/common/src/java/org/apache/lucene/
analysis/core/StopAnalyzer.java:48-61``; filtering semantics from
``core/StopFilter.java`` (position increments of removed tokens are
*preserved* as holes — downstream consumers see the original positions).
"""

from __future__ import annotations

ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

__all__ = ["ENGLISH_STOP_WORDS"]

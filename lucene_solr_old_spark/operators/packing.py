"""Training-sequence packing: greedy concatenation of documents into
fixed-token-budget sequences — the step between a cleaned corpus and a
pre-training dataloader (every published LLM data pipeline packs
documents into ``max_seq_len`` windows to avoid padding waste).

``pack_sequences`` is deterministic and distributed:

  * documents are routed to partitions by a hash of the key and sorted
    by key inside each partition, so the same corpus always produces the
    same packs regardless of input partitioning;
  * packing itself is a per-partition greedy first-fit-on-sorted-order
    pass inside ``mapInPandas`` (Arrow batches, no shuffle after the one
    routing exchange);
  * sequence ids are ``(partition_id, local_seq)`` pairs — globally
    unique without any driver coordination;
  * documents longer than the budget become single-doc oversize packs
    (flagged) rather than being silently dropped or split.

At 100 TB this is exactly one hash exchange plus a linear pass; pack
utilization (``total_tokens / budget``) is the quality metric a caller
monitors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pack_sequences", "pack_sequences_stable",
           "chunk_documents"]


def pack_sequences(docs: DataFrame, max_tokens: int,
                   key_col: str = "doc_id", text_col: str = "text",
                   num_partitions: int | None = None) -> DataFrame:
    """(seq_id, doc_ids, n_docs, total_tokens, oversize) — greedy packs
    of whitespace-token counts within ``max_tokens``.

    Greedy discipline: walk the partition's docs in key order, start a
    new pack whenever the next document would overflow the budget.  A
    single document above the budget forms its own pack with
    ``oversize = true`` (callers usually truncate those downstream)."""
    import pandas as pd

    with_tokens = docs.select(
        F.col(key_col).cast("string").alias("key"),
        F.size(F.filter(F.split(F.col(text_col), " "),
                        lambda x: x != F.lit(""))).alias("n_tokens"))
    if num_partitions is not None:
        with_tokens = with_tokens.repartition(num_partitions, "key")
    else:
        with_tokens = with_tokens.repartition("key")

    def pack(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        rows = []
        for b in batches:
            rows.extend(zip(b["key"], b["n_tokens"]))
        rows.sort(key=lambda r: r[0])
        out = []
        cur_keys: list[str] = []
        cur_tok = 0
        seq = 0

        def flush():
            nonlocal cur_keys, cur_tok, seq
            if cur_keys:
                out.append((f"{pid}-{seq}", cur_keys, len(cur_keys),
                            cur_tok, cur_tok > max_tokens))
                seq += 1
                cur_keys, cur_tok = [], 0

        for key, n in rows:
            n = int(n)
            if n > max_tokens:
                flush()
                cur_keys, cur_tok = [key], n
                flush()
                continue
            if cur_tok + n > max_tokens:
                flush()
            cur_keys.append(key)
            cur_tok += n
        flush()
        yield pd.DataFrame(
            out, columns=["seq_id", "doc_ids", "n_docs", "total_tokens",
                          "oversize"])

    return with_tokens.mapInPandas(
        pack,
        "seq_id string, doc_ids array<string>, n_docs long, "
        "total_tokens long, oversize boolean")


def pack_sequences_stable(docs: DataFrame, max_tokens: int,
                          key_col: str = "doc_id", text_col: str = "text",
                          hex_chars: int = 1) -> DataFrame:
    """Order-stable packing: seq ids are a pure function of the corpus
    content, independent of Spark's partition layout.

    Documents are bucketed by the first ``hex_chars`` hex digits of
    ``md5(key)`` (16^hex_chars buckets — the same rerun-stable md5 idiom
    as operators/sampling.py), sorted by key INSIDE each bucket, and
    packed greedily with the unified rule

        new pack  <=>  first doc in bucket OR running_tokens + n > budget

    which also gives an over-budget document its own ``oversize`` pack
    (running_tokens = n > budget forces the next doc out too).  Because
    bucket and order are content-derived, the result is identical under
    any input partitioning AND expressible as a recursive SQL scan —
    unlike :func:`pack_sequences`, whose (partition_id, local_seq) ids
    depend on the hash-shuffle layout.

    Plan: one hash exchange on the bucket column with a (bucket, key)
    sort inside each partition, then a STREAMING linear pass in
    ``mapInPandas`` — rows arrive already grouped by bucket and
    key-ordered, so the worker keeps only the CURRENT pack's state
    (never a whole bucket, never a whole partition: many buckets
    hash-route into one partition, so buffering per-bucket would not
    bound memory either) and emits finished packs batch by batch.
    Per-task memory is O(largest single pack), independent of
    ``hex_chars`` and of how many buckets share a partition.

    Returns (seq_id, doc_ids, n_docs, total_tokens, oversize).
    """
    import pandas as pd

    cols = ["seq_id", "doc_ids", "n_docs", "total_tokens", "oversize"]
    key = F.col(key_col).cast("string")
    with_tokens = docs.select(
        key.alias("key"),
        F.size(F.filter(F.split(F.col(text_col), " "),
                        lambda x: x != F.lit(""))).alias("n_tokens"),
        F.substring(F.md5(key), 1, hex_chars).alias("bucket"))
    routed = (with_tokens.repartition("bucket")
              .sortWithinPartitions("bucket", "key"))

    def pack(batches):
        bk = None          # current bucket
        seq = -1           # pack ordinal within bucket
        cur_keys: list[str] = []
        cur = 0            # running token count of the open pack
        out: list[tuple] = []

        def close():
            if cur_keys:
                out.append((f"{bk}-{seq}", list(cur_keys), len(cur_keys),
                            cur, cur > max_tokens))

        for b in batches:
            for k, n, b_ in zip(b["key"], b["n_tokens"], b["bucket"]):
                n = int(n)
                if b_ != bk:
                    close()
                    bk, seq, cur_keys, cur = b_, -1, [], 0
                if seq < 0 or cur + n > max_tokens:
                    close()
                    seq += 1
                    cur_keys, cur = [], 0
                cur_keys.append(k)
                cur += n
            if out:  # stream finished packs out per Arrow batch
                yield pd.DataFrame(out, columns=cols)
                out = []
        close()
        if out:
            yield pd.DataFrame(out, columns=cols)

    return routed.mapInPandas(
        pack,
        "seq_id string, doc_ids array<string>, n_docs long, "
        "total_tokens long, oversize boolean")


def chunk_documents(docs: DataFrame, chunk_tokens: int = 256,
                    overlap: int = 0, key_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Overlapping fixed-token passage chunks — the embedding/RAG
    pipeline step between cleaning and vectorization.

    Chunk ``c`` of a document covers token positions
    ``[c*stride, c*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the final partial chunk is
    kept UNLESS it adds no tokens beyond the previous chunk's coverage
    (``c*stride + overlap >= doc_len`` for ``c >= 1`` — a trailing
    partial shorter than ``overlap`` would be a strict SUBSET of the
    previous chunk, duplicating text downstream; standard sliding-window
    chunkers suppress it).  Returns (key, chunk_id, n_tokens,
    chunk_text) with whitespace tokens rejoined.

    Plan: tokens never leave their document's rows — each token
    computes its (small, bounded by ceil(chunk/stride)) set of owning
    chunk ids as an array and explodes it, then ONE groupBy on
    (key, chunk_id) reassembles chunks with sort_array over (pos,
    token) structs.  No window functions, no shuffle beyond the single
    chunk groupBy; at 100 TB this is the same one-exchange shape as the
    inversion build."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    arr = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    toks = docs.select(
        F.col(key_col).alias("key"),
        F.size(arr).alias("doc_len"),
        F.posexplode(arr).alias("pos", "w"))
    # owning chunks: ceil((pos - chunk + 1)/stride) <= c <= pos // stride
    lo = F.greatest(
        F.lit(0),
        F.ceil((F.col("pos") - chunk_tokens + 1) / F.lit(stride)))
    hi = F.floor(F.col("pos") / F.lit(stride))
    owned = (toks.select(
        "key", "pos", "w", "doc_len",
        F.explode(F.sequence(lo.cast("int"), hi.cast("int")))
        .alias("chunk_id"))
        # drop a trailing chunk that is a strict subset of its predecessor
        .where((F.col("chunk_id") == 0)
               | (F.col("chunk_id") * stride + overlap < F.col("doc_len"))))
    return (owned.groupBy("key", "chunk_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.array_join(
                     F.transform(
                         F.sort_array(F.collect_list(
                             F.struct("pos", "w"))),
                         lambda s: s["w"]),
                     " ").alias("chunk_text")))

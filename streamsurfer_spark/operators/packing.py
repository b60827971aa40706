"""Greedy sequence packing: fill fixed-size context windows with documents.

No counterpart in the reference (/root/reference/main.go:1-312 — SURVEY
§2.2); engine-side capability for LLM training-data pipelines: assign each
document to a (bin, offset) inside fixed token-capacity context windows,
greedily in a deterministic document order — the packing step that turns a
curated corpus into dense training sequences. The greedy rule is the same
byte-budget chunking idiom as the reference's sink queue (flush-before-
insert, ``main.go:207-224``) lifted from bytes to tokens.

Greedy packing is a sequential recurrence (each document's bin depends on
every prior document in its domain), so it cannot be a window expression.
The scale pattern is HIERARCHICAL packing, which is how production
pipelines do it: shard the corpus into bounded packing domains
(here (lang, doc_id % n_shards); in production hash-buckets sized to a
few hundred MB), then run the sequential fill inside each domain with an
Arrow-batched ``applyInPandas``. Domains are independent → one shuffle on
the domain key, then embarrassingly parallel; no domain ever exceeds the
shard budget, so state stays in one task's memory by construction.
Oversized documents (n_tokens > capacity) get a bin of their own rather
than being split — splitting is ql24's chunking operator.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from streamsurfer_spark.operators.text import token_count

PACK_SCHEMA = (
    "doc_id long, lang string, shard long, n_tokens long, "
    "bin_id long, bin_offset long"
)


def pack_sequences(
    docs: DataFrame,
    capacity: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Greedy first-open-bin packing within (lang, doc_id % n_shards).

    Documents are packed in ascending doc_id order within their domain:
    a document that would overflow the current bin (offset + n_tokens >
    capacity) starts the next bin at offset 0. Returns one row per
    document: (doc_id, lang, shard, n_tokens, bin_id, bin_offset) with
    bin_id numbered from 1 per domain.
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        if pdf["n_tokens"].isna().any():
            # a NULL text yields a NULL token count (NaN here); packing it
            # would poison every later offset in the domain with NaN and
            # die on the int64 cast with an opaque error — or worse,
            # silently mispack (r7 review, verified). Fail naming the doc.
            bad = pdf.loc[pdf["n_tokens"].isna(), "doc_id"].iloc[0]
            raise ValueError(
                f"pack_sequences: NULL token count for doc_id {bad} "
                "(NULL text?) — filter or impute before packing"
            )
        bins, offsets = [], []
        bin_id, fill = 1, 0
        for n in pdf["n_tokens"]:
            if fill > 0 and fill + n > capacity:
                bin_id += 1
                fill = 0
            bins.append(bin_id)
            offsets.append(fill)
            fill += n
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_offset"] = pd.Series(offsets, dtype="int64")
        return pdf

    base = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % F.lit(n_shards)).alias("shard"),
        token_count().alias("n_tokens"),
    )
    return base.groupBy("lang", "shard").applyInPandas(pack, PACK_SCHEMA)

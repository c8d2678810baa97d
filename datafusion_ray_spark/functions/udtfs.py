"""Python table functions (Spark 4 UDTFs) — the third tier of the §2.6
exceed-parity surface: SQL-callable TABLE functions (1 row in → N rows
out), usable standalone or as ``LATERAL`` correlations.

The reference exposes no UDF surface at all; Spark 4's ``@udtf`` gives a
typed row-generator API. These remain the documented slow path (per-row
Python) — the chunker's hot-path twin is the pure-SQL ``doc_chunk`` query
(`queries/pipeline.py`); the UDTF form exists for SQL callers who need
arbitrary Python logic in the generator.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, n_tokens int, chunk string")
class ChunkTokens:
    """Fixed-window token chunking with stride (the doc_chunk shape):
    ``SELECT * FROM chunk_tokens(text, 64, 48)`` or laterally per document
    ``SELECT d.doc_id, c.* FROM documents d,
    LATERAL chunk_tokens(d.text, 64, 48) c``."""

    def eval(self, text: str, size: int, stride: int):
        toks = (text or "").split()
        if not toks:
            return
        off = 0
        chunk_id = 0
        while True:
            window = toks[off : off + size]
            yield chunk_id, len(window), " ".join(window)
            if off + size >= len(toks):
                return
            off += stride
            chunk_id += 1


@udtf(returnType="ngram string")
class CharNgrams:
    """Distinct character n-grams of a string (fingerprinting helper):
    ``SELECT * FROM char_ngrams(s, 3)``."""

    def eval(self, text: str, n: int):
        seen = set()
        s = text or ""
        for i in range(max(0, len(s) - n + 1)):
            g = s[i : i + n]
            if g not in seen:
                seen.add(g)
                yield (g,)


def register_udtfs(spark) -> None:
    """Register the table functions for SQL use on a session."""
    spark.udtf.register("chunk_tokens", ChunkTokens)
    spark.udtf.register("char_ngrams", CharNgrams)

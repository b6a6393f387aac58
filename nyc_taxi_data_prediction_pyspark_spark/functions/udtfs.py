"""Python UDTF surface (SURVEY.md §2.10: the reference registers zero
UDFs/UDTFs; the declared text-pipeline capabilities want a
table-function escape hatch for row-expanding Python logic that
built-ins can't express).

``TokenizeWithOffsets`` emits one row per token with its 1-based
position AND the running character offset — the offset is stateful
across the yielded rows (a fold explode alone can't do), which is the
minimal honest use-case for a UDTF over plain ``explode(split(...))``.

Scale note: a Python UDTF is the slow path (row-at-a-time through the
Python worker). It earns its place only when the per-row expansion
logic is genuinely imperative; anything expressible with
``transform``/``posexplode`` should stay JVM-side (see
operators/text.py, which keeps tokenization/chunking in built-ins).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string, char_offset int")
class TokenizeWithOffsets:
    """LATERAL-join against documents:
    ``SELECT doc_id, t.* FROM documents, LATERAL tokenize_offsets(text) t``."""

    def eval(self, text: str):
        if text is None:
            return
        off = 0
        for i, tok in enumerate(text.split(" "), 1):
            yield (i, tok, off)
            off += len(tok) + 1


def register(spark) -> None:
    spark.udtf.register("tokenize_offsets", TokenizeWithOffsets)

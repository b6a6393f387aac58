"""Text → embedding column (SURVEY.md §2.10 M2).

The reference ships ``sentence-transformers`` in its container deps
(reference: docker-compose.yaml:69) but no model code. The Spark-native
shape is an Arrow-vectorized pandas UDF with per-executor (per-Python-
worker) model loading — the model loads once per worker, not per row
or per batch.

The transformer library is not in this container, so the encoder is a
deterministic hashed bag-of-words stand-in behind the same signature;
swapping in a real model changes only ``_load_model``.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, FloatType

_MODEL = None  # per-Python-worker cache (loaded once per executor process)

EMB_DIM = 32


def _load_model():
    """Loads sentence-transformers when present (the reference ships it
    in its container deps, docker-compose.yaml:69); falls back to a
    deterministic hashed bag-of-words encoder in this container. Either
    way the model loads ONCE per Python worker process."""
    global _MODEL
    if _MODEL is None:
        try:  # pragma: no cover - transformer lib not in this container
            from sentence_transformers import SentenceTransformer

            m = SentenceTransformer("all-MiniLM-L6-v2")
            _MODEL = lambda texts: [list(map(float, v)) for v in m.encode(texts)]
            return _MODEL
        except ImportError:
            pass
        import hashlib

        def encode(texts: list[str]) -> list[list[float]]:
            out = []
            for t in texts:
                v = [0.0] * EMB_DIM
                for tok in (t or "").lower().split():
                    b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % EMB_DIM
                    v[b] += 1.0
                s = sum(v) or 1.0
                out.append([x / s for x in v])
            return out

        _MODEL = encode
    return _MODEL


@F.pandas_udf(ArrayType(FloatType()))
def embed_text(texts: pd.Series) -> pd.Series:
    model = _load_model()
    return pd.Series(model(texts.fillna("").tolist()))


def with_embeddings(df: DataFrame, text_col: str = "text", out_col: str = "embedding") -> DataFrame:
    """Attach an embedding column. Arrow-batched; scales as a narrow
    map stage (no shuffle)."""
    return df.withColumn(out_col, embed_text(F.col(text_col)))

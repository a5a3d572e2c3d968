"""Schema-drift guards for driver-generated testdata (VERDICT r4 §Next #9).

The driver regenerates ``/root/testdata`` between rounds and has already
changed a physical encoding once (events ``ts``: TIMESTAMP(NANOS) → naive
``timestamp[us]``), which cost a full round of broken queries. The events
loader adapts encodings itself (``sources.events._ts_to_us``); for the other
tables a presence+type check at the load site turns the next silent drift
into a one-line diagnosis instead of a mid-query AnalysisException (or,
worse, silently wrong results from a widened type).

Types are matched by *prefix* of ``DataType.simpleString()`` so acceptable
widenings stay accepted (``array<float>`` vs ``array<double>`` differ and
should fail — the integer-quantized ANN oracle depends on float32 exactness
— while ``decimal(...)`` variants of an int column should too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def require(df: DataFrame, table: str, cols: dict[str, str | tuple[str, ...]]) -> DataFrame:
    """Assert ``df`` has each column with a simpleString starting with one of
    the allowed prefixes; raise one line naming table, column, got/want."""
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for name, want in cols.items():
        wants = (want,) if isinstance(want, str) else want
        got = have.get(name)
        if got is None:
            raise TypeError(
                f"{table}: column {name!r} missing (have {sorted(have)}) — "
                f"driver testdata schema drifted; adapt the loader"
            )
        if not any(got.startswith(w) for w in wants):
            raise TypeError(
                f"{table}.{name}: type {got!r}, expected {'|'.join(wants)} — "
                f"driver testdata schema drifted; adapt the loader"
            )
    return df


def documents(df: DataFrame) -> DataFrame:
    return require(
        df, "documents",
        {"doc_id": ("bigint", "int"), "text": "string", "lang": "string",
         "source": "string"},
    )


def documents_text(df: DataFrame) -> DataFrame:
    """Narrow variant for ops that only consume (doc_id, text) — dedup and
    curation run over synthetic fixture corpora in tests, which legitimately
    lack lang/source."""
    return require(df, "documents", {"doc_id": ("bigint", "int"), "text": "string"})


def embeddings(df: DataFrame) -> DataFrame:
    return require(
        df, "embeddings",
        {"vec_id": ("bigint", "int"), "embedding": "array<float>"},
    )

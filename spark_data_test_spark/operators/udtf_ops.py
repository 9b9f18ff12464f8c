"""Python UDTF operators (Spark 4 user-defined table functions).

Document chunking for context-window preparation: one document row
expands to N chunk rows via a lateral table function — the UDTF is the
natural API when per-row Python must EMIT A VARIABLE NUMBER OF ROWS
(explode of a computed list would materialize the whole list per row
first; a pandas UDF cannot change cardinality).

UDTFs execute row-at-a-time in Python, so this is deliberately the only
operator family on that path — the chunker is pure slicing (no
tokenizer), and at 100 TB the same chunk boundaries can be produced
JVM-side with ``explode(sequence(...))`` + ``substring`` (exactly what
the DuckDB oracle does), which makes this query double as a
UDTF-vs-built-in equivalence check.
"""

import pyspark.sql.functions as F
from pyspark.sql.functions import udtf

from spark_data_test_spark.operators.relational import query, t

_CHUNK_CHARS = 100


@udtf(returnType="chunk_id int, chunk string, n_chars int")
class ChunkText:
    """Slice a document into fixed-size character chunks (the last
    chunk may be short). Deterministic, pure function of the input."""

    def eval(self, text: str):
        if text is None:
            return
        for i, start in enumerate(range(0, len(text), _CHUNK_CHARS)):
            piece = text[start : start + _CHUNK_CHARS]
            yield (i, piece, len(piece))


@query(
    "udtf_chunk_documents",
    f"""
    SELECT doc_id,
           CAST((i - 1) // {_CHUNK_CHARS} AS INTEGER) AS chunk_id,
           substr(text, i, {_CHUNK_CHARS}) AS chunk,
           CAST(length(substr(text, i, {_CHUNK_CHARS})) AS INTEGER) AS n_chars
    FROM documents, unnest(generate_series(1, length(text), {_CHUNK_CHARS})) AS u(i)
    """,
)
def udtf_chunk_documents(spark, sf_dir):
    """Context-window chunking via a lateral Python UDTF; the oracle
    derives identical chunks with pure SQL slicing, so the Python
    row-expansion path is value-checked against the built-in one."""
    # fixed names: register/createOrReplace are overwrite-semantics, so
    # repeated invocations reuse one catalog entry instead of
    # accumulating uuid-suffixed functions and views per call
    fn_name, view = "spark_graft_chunk_text", "spark_graft_udtf_docs"
    spark.udtf.register(fn_name, ChunkText)
    t(spark, sf_dir, "documents").select("doc_id", "text").createOrReplaceTempView(
        view
    )
    return spark.sql(
        f"SELECT d.doc_id, c.* FROM {view} d, LATERAL {fn_name}(d.text) c"
    )

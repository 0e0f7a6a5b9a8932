"""Python UDTFs: SQL-callable table functions (Spark 4 API surface).

A UDTF is the SQL front-end's native row-expanding extension point —
`SELECT s.* FROM docs, LATERAL sentence_windows(doc_id, text) s` — the
per-row generator that `explode` can't express when the expansion needs
imperative logic. This module keeps the engine's UDF discipline: UDTFs
are for genuinely non-relational row expansion only; anything a
`sequence`/`explode`/`slice` pipeline can express stays JVM-side (see
`operators/curation.doc_chunks` for the declarative chunker — this UDTF
is the escape hatch, registered so the SQL front-end has it, with the
declarative form remaining the hot path).

`arrow_enabled` batches the exchange; each `eval` still runs per row —
which is exactly a UDTF's contract (the yielded row count is
data-dependent).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="doc_id bigint, win_id bigint, start_sent bigint, text string")
class SentenceWindows:
    """Overlapping sentence windows: 3 sentences per window, stride 2.

    Sentence split on '. ' (the corpus' normalized delimiter); emits
    complete-and-tail windows so every sentence appears in >= 1 window —
    the RAG-style indexing unit built from sentence boundaries rather
    than the fixed character strides of ``doc_chunks``.
    """

    WIN = 3
    STRIDE = 2

    def eval(self, doc_id: int, text: str):  # noqa: A002
        if text is None:
            return
        sents = [s for s in text.split(". ") if s]
        i, win_id = 0, 0
        while i < len(sents):
            chunk = sents[i : i + self.WIN]
            yield doc_id, win_id, i, ". ".join(chunk)
            if i + self.WIN >= len(sents):
                break
            i += self.STRIDE
            win_id += 1


def register_udtfs(spark) -> None:
    """Register the engine's table functions on a session's SQL front-end."""
    spark.udtf.register("sentence_windows", SentenceWindows)

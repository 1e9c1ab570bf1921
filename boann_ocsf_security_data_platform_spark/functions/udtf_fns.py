"""Python UDTF surface (Spark 4 table functions) — the §2.9 extension
point for row→rows expansions that aren't expressible as a single
Column/HOF pipeline.

The reference's plugin surface is row→row (EnrichmentPlugin ABC,
`scripts/helpers/enrichment_plugins.py`); Spark 4 adds a first-class
row→TABLE plugin shape. We use it sparingly: UDTFs run Python per row
(Arrow-batched but not vectorized across rows), so anything HOF-
expressible (chunking, n-grams) stays a Column expression in
`operators/text.py`. The UDTF below is the demonstration case that
genuinely wants imperative Python: stateful sentence-boundary chunking
with a per-chunk overlap carry — a scan-bandwidth row-local expansion,
no shuffle, parallel per partition at any scale.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_sentences int")
class SentenceChunks:
    """Split a document into chunks of at most ``max_chars``, breaking
    only at sentence boundaries ('.', '!', '?' followed by space), with
    the last sentence of each chunk repeated at the start of the next
    (overlap carry — the RAG-chunking recipe). A sentence longer than
    ``max_chars`` becomes its own oversized chunk rather than being cut
    mid-sentence."""

    def eval(self, text: str, max_chars: int):  # noqa: D102
        if text is None:
            return
        import re

        sentences = [
            s.strip()
            for s in re.split(r"(?<=[.!?])\s+", text)
            if s.strip()
        ]
        if not sentences:
            return
        chunk: list[str] = []
        size = 0
        idx = 0
        for s in sentences:
            if chunk and size + 1 + len(s) > max_chars:
                yield idx, " ".join(chunk), len(chunk)
                idx += 1
                chunk = [chunk[-1]]  # overlap carry
                size = len(chunk[0])
            chunk.append(s)
            size += (1 if size else 0) + len(s)
        if chunk:
            yield idx, " ".join(chunk), len(chunk)

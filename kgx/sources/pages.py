"""Pages-table source helpers (input_hint shape: url, warc_ts, html, text,
lang) with column pruning at the read — the ``html`` binary column is by far
the widest and is only loaded by the text-extraction stage; every other
stage reads the narrow derived tables."""

from __future__ import annotations

import ray.data as rd

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(path: str, *, columns: list[str] | None = None):
    """Read the sharded pages Parquet; prune to the columns a stage needs."""
    return rd.read_parquet(path, columns=columns or ["url", "html", "text", "lang"])


def pages_from_documents(documents_path: str):
    """Adapt a generic text corpus (testdata ``documents`` table:
    doc_id, text, lang, source, n_chars) into the pages shape so the same
    pipeline runs over it: url = ``doc://{doc_id}``, html = null, text as-is.
    """
    import pyarrow as pa

    def to_pages(batch: pa.Table) -> pa.Table:
        urls = [f"doc://{d}" for d in batch["doc_id"].to_pylist()]
        n = len(urls)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * n, pa.timestamp("us")),
            "html": pa.array([None] * n, pa.binary()),
            "text": batch["text"].combine_chunks(),
            "lang": batch["lang"].combine_chunks(),
        })

    return rd.read_parquet(documents_path,
                           columns=["doc_id", "text", "lang"]).map_batches(
        to_pages, batch_format="pyarrow")

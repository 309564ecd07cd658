from .archive import read_archive  # noqa: F401
from .warc import read_warc, write_warc  # noqa: F401
from .io import (  # noqa: F401
    CORPUS_SCHEMA,
    INPUT_COLUMNS,
    read_corpus,
    read_corpus_lance,
    read_corpus_parquet,
    read_html_dir,
    read_jsonl_docs,
    write_corpus_lance,
    write_corpus_parquet,
    write_eval_report,
    write_markdown_tree,
)

from .corpus import corpus_from_dir, ingest_source_files, read_source_files, IGNORED_DIRS, IGNORED_EXTENSIONS

__all__ = [
    "corpus_from_dir",
    "ingest_source_files",
    "read_source_files",
    "IGNORED_DIRS",
    "IGNORED_EXTENSIONS",
]

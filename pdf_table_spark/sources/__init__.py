from .corpus import CORPUS_SCHEMA, read_corpus, write_corpus  # noqa: F401

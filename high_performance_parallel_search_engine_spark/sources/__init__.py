"""Sources: synthetic corpus generation + testdata table readers."""

from .synth import build_corpus_df, corpus_rows, page_record, seed_urls  # noqa: F401
from .tables import TESTDATA_TABLES, load_table, load_tables  # noqa: F401

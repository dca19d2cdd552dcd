"""Pure-Python semantic kernel.

Exact behavioural ports of the reference C engine's per-row functions
(`/root/reference/Serial Version/src/crawler.c`, `parser.c`, `utils.c`).
These definitions are the single source of truth shared by

- the vectorized pandas UDFs (functions/udfs.py),
- the pure-Column SQL builders where expressible (functions/urlsql.py),
- the serial BFS oracle (kernel/bfs.py) used as the correctness fixture.

No Spark imports here - keep it dependency-free so executors import cheaply.
"""

from .urls import (  # noqa: F401
    extract_base_domain,
    is_valid_crawl_url,
    normalize_url,
    resolve_url,
    url_host,
    url_priority,
)
from .html import (  # noqa: F401
    extract_links,
    extract_title,
    html_to_text,
    is_useful_content,
)
from .text import (  # noqa: F401
    DEFAULT_STOPWORDS,
    TOKEN_DELIMS,
    stem_openmp,
    stem_serial,
    tokenize,
)

"""Row-level functions: Catalyst-native Column builders + pandas UDFs.

Policy: everything that Catalyst can express stays a Column expression
(whole-stage codegen, pushdown-friendly); only the HTML state machine and
the exact URL canonicalizer quirks that need imperative string logic run as
Arrow-batched pandas UDFs. No row-at-a-time Python UDFs anywhere.
"""

from .urlsql import (  # noqa: F401
    base_domain_col,
    host_col,
    is_html_content_url_col,
    normalize_url_col,
    url_priority_col,
    valid_crawl_url_col,
)
from .udfs import (  # noqa: F401
    extract_struct_udf,
    html_text_and_links,
    normalize_url_udf,
)

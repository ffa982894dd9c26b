"""Pure (Spark-free) functions shared by the Arrow UDFs, the synthetic-data
generator, and the single-node differential oracle.

Sharing ONE pinned implementation between generator, engine UDF and oracle is
what makes "byte-identical extracted text per url" (BASELINE.json input_hint)
a closed, testable invariant.
"""

from spacetime_crawler_spark.functions.urlnorm import (  # noqa: F401
    canonicalize_url,
    get_host,
    is_valid,
    resolve_and_canonicalize,
)
from spacetime_crawler_spark.functions.textextract import (  # noqa: F401
    extract_links,
    extract_text,
)
from spacetime_crawler_spark.functions.tokenize import (  # noqa: F401
    STOPWORDS,
    TOKEN_SPLIT_REGEX,
    tokenize,
)

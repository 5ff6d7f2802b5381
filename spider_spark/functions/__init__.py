"""Pure kernels + vectorized (Arrow-batched) UDF wrappers.

Every function here is deterministic and side-effect free; the crawl
oracle (spider_spark.oracle) imports the same kernels, so engine/oracle
divergence can only come from orchestration — which is exactly what the
parity tests are meant to check.
"""

from .tokenizer import tokenize, tokenize_series, is_stop_word, STOP_WORDS  # noqa: F401
from .urlnorm import canonicalize, extract_host, extract_edition  # noqa: F401
from .cjk import is_cjk  # noqa: F401

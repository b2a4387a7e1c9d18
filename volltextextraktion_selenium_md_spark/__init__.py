"""PySpark-native crawl frontier + fetch scheduler.

A from-scratch distributed re-expression of the capabilities of the
reference service ``janschachtschabel/Volltextextraktion-Selenium-MD``
(a one-URL-per-request FastAPI crawler, see /root/reference):

- the reference's *implied* crawl loop (seeds -> links -> seeds) becomes an
  explicit BFS frontier over DataFrames with deterministic ordering,
- its per-page semantics (strategy classifier, link classification,
  error-page detection, conversion chain, retry/backoff, truncation)
  become vectorized Column expressions / Arrow-batched pandas UDFs,
- its process-local capacity middleware becomes per-host politeness
  scheduling (budget rank cut + crawl-delay slots) over partitions.

Everything is DataFrame-first: Catalyst plans the joins/windows; Python
runs only inside Arrow-vectorized UDFs (canonicalization, payload decode).
"""

__version__ = "0.1.0"

from volltextextraktion_selenium_md_spark.session import get_spark  # noqa: F401

"""visiblev8_crawler_spark — a PySpark-native rebuild of the crawl/analytics
capabilities of ``aswad546/visiblev8-crawler`` (reference at /root/reference,
read-only).

This is NOT a port: the reference's FastAPI/Celery/Redis/Postgres/Chromium
stack (see SURVEY.md §0) is re-expressed as Spark DataFrame plans:

- URL frontier + fetch scheduler  -> ``streaming.scheduler`` (micro-batch waves)
- URL-seen set (reference dedup, backend tasks.py:148-156)
                                  -> ``operators.dedup`` (anti-join + bloom)
- politeness / robots gating      -> ``operators.waves`` (window budgets)
- browser fetch (crawler.js)      -> ``operators.fetch`` (Arrow UDF decode+verify)
- Postgres analytics SQL          -> ``plans.queries`` (DataFrame plans + SQL oracles)
"""

__version__ = "0.1.0"

"""wtq — a PySpark-native web-text quality-filter engine.

Brand-new implementation (not a port) with the data-processing
capabilities of the reference rule-based validator
``FelisPimeja/openstreetmap_water`` (see SURVEY.md): per-record rule
battery with stable rule codes (reference ``err_codes``,
proccess_data.sql:741-808), per-record fired-rule aggregation
(``err_all``, proccess_data.sql:814-841), ingest-time keep/drop
predicate (water.lua:224-241), and tag/content scrubbing
(water.lua:84-221) — re-expressed Spark-first over Common-Crawl-style
pages ``(url, warc_ts, html, text, lang)``.
"""

__version__ = "0.1.0"

"""Structured Streaming layer (SURVEY §2.10 / §7 step 8).

The reference is pure batch (Airflow-triggered, `composer/goSalesPipeline.py:63`
sets `schedule_interval=None`) but declares incremental metadata (watermark
columns, merge keys). This package is the streaming realization of those
declared-but-unused semantics: file-source streams, watermarked tumbling/
sliding/session windows, dedup-within-watermark, foreachBatch upsert, and a
custom stateful sessionizer.
"""

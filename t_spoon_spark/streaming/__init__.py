"""Streaming execution: the batch TGraph runner driven by Structured
Streaming (micro-batch = transaction epoch), SURVEY.md §7 M3.
"""

from t_spoon_spark.streaming.runner import StreamRunner, StreamMetrics

__all__ = ["StreamRunner", "StreamMetrics"]

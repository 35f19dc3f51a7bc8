"""content_extractor_spark — PySpark-native content extraction engine.

A from-scratch, Spark-first reimplementation of the capabilities of
coverified/content_extractor (reference at /root/reference): profile-
driven main-content extraction over tables of interleaved text+media
documents, plus the relational tail (dedup, change detection, tag
consolidation) and large-scale training-data operators (dedup families,
similarity search, text analysis).
"""

__version__ = "0.1.0"

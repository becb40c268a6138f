"""Structured Streaming surface (SURVEY §2.9).

The reference has no streams; its nearest analogue is the polling retry
loop (Wrap.pm:528-631) that re-scans a directory until a deadline. The
Spark-era equivalent is a file-source stream with `availableNow`
batch-equivalent semantics — plus true streaming extensions (watermarked
tumbling/sliding windows, stateful sessionization) over event data.
"""

"""Driver-side file-transfer connectors (SURVEY §2.1 S17-S21, §2.2
K16-K20): fetch/upload/archive/retention around the data plane.

These are deliberately NOT Spark operators — at 100 TB the idiomatic
design lands remote files in object storage first (SURVEY §4.2); this
layer covers the reference's operational surface for modest file
exchange volumes.
"""

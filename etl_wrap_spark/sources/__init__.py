"""File-format sources (SURVEY §2.1 S1-S13): declarative readers with the
reference's option surface (skip rows/pattern, fixed-width, quoted CSV,
header renaming, stop-on-empty, XML, xlsx) re-expressed on Spark sources.
"""

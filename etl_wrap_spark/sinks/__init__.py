"""Sinks: text/excel writers, JDBC load semantics, merge/upsert operators."""

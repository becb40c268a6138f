"""Scalar function library: date/time (D1-D36), holiday calendars,
numeric normalization — reference Wrap/DateUtil.pm and the coercion
rules of Wrap/DB.pm, re-expressed as native Column expressions."""

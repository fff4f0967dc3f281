"""Scalar/vector function library: geo math, text analysis, sketches."""

"""Structured Streaming mirrors of the §2.8 batch queries."""

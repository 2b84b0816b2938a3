"""Composite operators beyond single expressions: span machinery, dedup,
similarity search, text analysis, multimodal plumbing. Everything here is a
DataFrame→DataFrame transformation designed for the 100 TB path — shuffles
are keyed and bounded, Python appears only behind Arrow-batched UDFs."""

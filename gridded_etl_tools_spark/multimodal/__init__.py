"""Multimodal columns: opaque binary payloads + typed metadata, processed
by Arrow-batched Pandas functions over ``mapInPandas``."""

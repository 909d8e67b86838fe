"""Multimodal column conventions (SURVEY.md §2.B L5): media as opaque
BINARY payloads + typed STRUCT metadata, processed by Arrow-batched
mapInPandas stages."""

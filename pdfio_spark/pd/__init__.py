"""PD layer: document semantics — page tree, content interpreter,
fonts, text layout, per-document extraction."""
from .extract import extract_doc
from .pagetree import PDDoc, PDPage

__all__ = ["extract_doc", "PDDoc", "PDPage"]

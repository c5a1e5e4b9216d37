"""COS layer: PDF file structure — object model, lexer, filters,
xref/object resolution, decryption. Pure Python, Spark-free."""
from .objects import (Comment, HexStr, IndirectObject, LitStr, Name, ObjStm,
                      Ref, Stream, f32)
from .lexer import Buf, ParseError
from .doc import CosDoc, PDFError
from . import filters

__all__ = ["Comment", "HexStr", "IndirectObject", "LitStr", "Name", "ObjStm",
           "Ref", "Stream", "f32", "Buf", "ParseError", "CosDoc", "PDFError",
           "filters"]

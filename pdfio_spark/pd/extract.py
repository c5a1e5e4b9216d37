"""Per-document extraction driver — the function the Arrow-batch UDF
maps over rows.

Output text matches the reference test driver (extract_text,
/root/reference/test/debugIO.jl:72-82): per non-empty page, the page's
layout text followed by one '\\n'. Row-level failures are quarantined
into status/err — one bad PDF never kills a partition.
"""
from __future__ import annotations

import traceback

from ..cos.crypt import UnsupportedEncryption
from .layout import span_sort
from .pagetree import PDDoc

__all__ = ["extract_doc", "EXTRACT_STATUS"]

EXTRACT_STATUS = ("ok", "partial", "error", "unsupported_encryption",
                  "empty", "timeout")  # timeout: pipeline row budget


def extract_doc(data: bytes, with_spans: bool = False,
                max_pages: int = 10000,
                first_page: int = 1,
                last_page: int | None = None) -> dict:
    """PDF bytes -> {n_pages, text, pages[], status, err}.

    first_page/last_page (1-based, inclusive) support page-sharded
    extraction of huge documents (pipeline.job.extract_pdfs_sharded)."""
    pages_out: list[dict] = []
    try:
        doc = PDDoc(data)
    except UnsupportedEncryption as e:
        return {"n_pages": 0, "text": "", "pages": [],
                "status": "unsupported_encryption", "err": str(e)}
    except Exception as e:
        return {"n_pages": 0, "text": "", "pages": [],
                "status": "error", "err": _fmt_err(e)}

    if last_page is not None:
        # explicit shard range: the caller bounds the work, so the
        # blanket max_pages cap must NOT apply — it silently emptied
        # every shard past page 10000 on exactly the page-heavy docs
        # the sharded path exists for (r4 review fix)
        n = min(doc.page_count(), last_page)
    else:
        n = min(doc.page_count(), max_pages)
    texts: list[str] = []
    errs: list[str] = []
    for i in range(max(1, first_page), n + 1):
        try:
            page = doc.get_page(i)
            if page.is_empty():
                continue
            state = page.eval_content()
            from .layout import show_text_layout
            txt = show_text_layout(state)
            prec = {"page_no": i, "text": txt}
            if with_spans:
                prec["spans"] = [
                    {"x0": float(min(t.lbx, t.rbx, t.rtx, t.ltx)),
                     "y0": float(min(t.lby, t.rby, t.rty, t.lty)),
                     "x1": float(max(t.lbx, t.rbx, t.rtx, t.ltx)),
                     "y1": float(max(t.lby, t.rby, t.rty, t.lty)),
                     "text": t.text,
                     "font": str(t.fontname),
                     "flags": int(t.fontflags)}
                    for t in span_sort(state["text_layout"])]
            # text is committed LAST so a span-construction failure
            # quarantines the whole page atomically — text and pages[]
            # can never disagree about which pages succeeded (r4)
            texts.append(txt + "\n")
            pages_out.append(prec)
        except Exception as e:  # per-page quarantine
            errs.append(f"p{i}: {_fmt_err(e)}")

    status = ("ok" if not errs and texts else
              "partial" if texts else
              "empty" if not errs else "error")
    return {"n_pages": doc.page_count(), "text": "".join(texts),
            "pages": pages_out, "status": status,
            "err": "; ".join(errs[:10])}


def _fmt_err(e: Exception) -> str:
    tb = traceback.extract_tb(e.__traceback__)
    loc = f"{tb[-1].name}:{tb[-1].lineno}" if tb else ""
    return f"{type(e).__name__}: {e} @{loc}"

"""Minimal pure-stdlib PDF writer for the report sink.

The reference renders its report as a landscape-A4 PDF table via reportlab
(call-debias.py:54-136).  This container ships no reportlab, so this module
emits the same document shape — one landscape-A4 page sequence, a 3-column
table of (record, literal, tag details) rows in Helvetica — as a handwritten
PDF 1.4: header, numbered objects, per-page content streams, a correct xref
table and trailer.  No compression, no fonts beyond the 14 standard ones,
nothing clever: the goal is a valid, openable document, not typography.

Layout mirrors the reference's table (readme.md:147-155): header row, then
data rows top-down, page-breaking as needed.
"""

from __future__ import annotations

import pathlib

# landscape A4 in points
PAGE_W, PAGE_H = 842.0, 595.0
MARGIN = 40.0
LEADING = 12.0
FONT_SIZE = 8.0
HEADER_SIZE = 10.0


def _esc(s: str) -> bytes:
    """PDF literal-string escape; non-Latin-1 chars degrade to '?'.

    Standard-font text strings are PDFDocEncoded/Latin-1; full Unicode
    would need an embedded font — out of scope for a no-dependency sink."""
    b = s.encode("latin-1", "replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _clip(s: str, width: int) -> str:
    return s if len(s) <= width else s[: width - 1] + "…"


def _table_pages(
    title: str, header: tuple[str, ...], rows: list[tuple[str, ...]]
) -> list[bytes]:
    """Lay out rows into per-page content streams (uncompressed)."""
    # column x-positions and char clips for the 3-column report table
    col_x = (MARGIN, MARGIN + 90, MARGIN + 330)
    col_clip = (16, 48, 80)
    pages: list[bytes] = []
    buf: list[bytes] = []
    y = 0.0

    def open_page(first: bool) -> float:
        buf.clear()
        buf.append(b"BT")
        y0 = PAGE_H - MARGIN
        if first:
            buf.append(f"/F1 {HEADER_SIZE} Tf 1 0 0 1 {MARGIN} {y0} Tm".encode())
            buf.append(b"(" + _esc(title) + b") Tj")
            y0 -= 2 * LEADING
        for x, h, c in zip(col_x, header, col_clip):
            buf.append(f"/F1 {HEADER_SIZE} Tf 1 0 0 1 {x} {y0} Tm".encode())
            buf.append(b"(" + _esc(_clip(h, c)) + b") Tj")
        return y0 - LEADING

    def close_page() -> None:
        buf.append(b"ET")
        pages.append(b"\n".join(buf))

    y = open_page(first=True)
    for row in rows:
        if y < MARGIN:
            close_page()
            y = open_page(first=False)
        for x, cell, c in zip(col_x, row, col_clip):
            buf.append(f"/F1 {FONT_SIZE} Tf 1 0 0 1 {x} {y} Tm".encode())
            buf.append(b"(" + _esc(_clip(cell, c)) + b") Tj")
        y -= LEADING
    close_page()
    return pages


def write_table_pdf(
    path: str | pathlib.Path,
    title: str,
    header: tuple[str, ...],
    rows: list[tuple[str, ...]],
) -> None:
    """Write a landscape-A4 table PDF.  Object plan: 1 Catalog, 2 Pages,
    3 Font, then per page (Page, Contents) pairs."""
    contents = _table_pages(title, header, rows)
    n_pages = len(contents)
    page_ids = [4 + 2 * i for i in range(n_pages)]

    objs: dict[int, bytes] = {}
    kids = b" ".join(b"%d 0 R" % i for i in page_ids)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, stream in zip(page_ids, contents):
        objs[i] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %.0f %.0f] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (PAGE_W, PAGE_H, i + 1)
        )
        objs[i + 1] = (
            b"<< /Length %d >>\nstream\n" % len(stream) + stream + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_obj = max(objs) + 1
    out += b"xref\n0 %d\n" % n_obj
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_obj, xref_at)
    )
    pathlib.Path(path).write_bytes(bytes(out))

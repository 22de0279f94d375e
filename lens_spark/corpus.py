"""Deterministic synthetic interleaved-document corpus.

The 10^12-doc Iceberg table is represented in-sandbox at small scale
(north_rule). All generation is seeded — same (n_docs, seed) → identical
bytes — so goldens are stable and bench runs are comparable across
parallelism levels. Shapes mirror FIXTURES.md F1:

- interleaving: 1-8 spans/doc of mixed kinds, array order SCRAMBLED
  relative to ``offset`` (catches nondeterministic collect_list);
- skew tail: ~1% giant docs with up to ``giant_spans`` spans;
- size buckets: payloads from tens of bytes to ~1 MB;
- edge rows: empty spans array, single-media doc, unsupported kind
  ('audio' → quarantine, reference v2_util.go:94 semantics), empty
  payload.
"""

from __future__ import annotations

import base64
import random

from lens_spark.extractors.ocr_stub import make_png

_WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "spark group query row data slow filter customer line batch value "
    "stream column vector agg plan stage shuffle broadcast salt skew"
).split()


# ---------------------------------------------------------------- PDF maker
def make_pdf(pages: list[dict]) -> bytes:
    """Build a fixture-subset PDF.

    Each page dict: ``{"lines": [str, ...]}`` for a text-layer page or
    ``{"caption": str}`` for a scanned page (≤10-char text layer + image
    XObject whose bytes are a PNG carrying the caption, i.e. the OCR
    ground truth). Uncompressed content streams; parseable by
    extractors/pdf_mini.py and by any real PDF reader.
    """
    objs: list[bytes] = []  # bodies; object number = index+1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    page_ids: list[int] = []
    pages_obj_placeholder = add(b"")  # obj 1 reserved for /Pages
    for p in pages:
        if "lines" in p:
            ops = b"BT /F1 12 Tf 72 720 Td\n"
            for ln in p["lines"]:
                esc = (
                    ln.encode("latin-1", "replace")
                    .replace(b"\\", b"\\\\")
                    .replace(b"(", b"\\(")
                    .replace(b")", b"\\)")
                )
                ops += b"(" + esc + b") Tj 0 -14 Td\n"
            ops += b"ET"
            cid = add(
                b"<< /Length " + str(len(ops)).encode() + b" >>\nstream\n"
                + ops + b"\nendstream"
            )
            page_ids.append(
                add(
                    b"<< /Type /Page /Parent 1 0 R /Contents "
                    + str(cid).encode() + b" 0 R >>"
                )
            )
        else:
            png = make_png(caption=p["caption"])
            iid = add(
                b"<< /Subtype /Image /Length " + str(len(png)).encode()
                + b" >>\nstream\n" + png + b"\nendstream"
            )
            # text layer below the 10-char threshold (reference ocr.go:41)
            ops = b"BT (p) Tj ET"
            cid = add(
                b"<< /Length " + str(len(ops)).encode() + b" >>\nstream\n"
                + ops + b"\nendstream"
            )
            page_ids.append(
                add(
                    b"<< /Type /Page /Parent 1 0 R /Contents "
                    + str(cid).encode() + b" 0 R /Resources << /XObject << /Im0 "
                    + str(iid).encode() + b" 0 R >> >> >>"
                )
            )

    kids = b" ".join(str(i).encode() + b" 0 R" for i in page_ids)
    objs[pages_obj_placeholder - 1] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(page_ids)).encode() + b" >>"
    )
    cat = add(b"<< /Type /Catalog /Pages 1 0 R >>")

    out = b"%PDF-1.4\n"
    for i, body in enumerate(objs, start=1):
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    out += b"trailer << /Root " + str(cat).encode() + b" 0 R >>\n%%EOF\n"
    return out


# ------------------------------------------------------------- HTML maker
def make_html(rng: random.Random, n_paras: int = 3) -> tuple[str, str]:
    """Build a boilerplate-wrapped page; returns (html, expected_main_text)
    where expected matches extractors/html_strip.strip_html defaults."""
    paras = [
        " ".join(rng.choice(_WORDS) for _ in range(rng.randint(12, 40)))
        for _ in range(n_paras)
    ]
    nav = "".join(f'<li><a href="/{w}">{w}</a></li>' for w in _WORDS[:6])
    body = "".join(f"<p>{p}</p>" for p in paras)
    html = (
        "<!DOCTYPE html><html><head><title>t</title>"
        "<style>p{color:red}</style><script>var x=1;</script></head>"
        f"<body><nav><ul>{nav}</ul></nav>"
        f"<header><a href='/'>home</a> | <a href='/x'>x</a></header>"
        f"<article>{body}</article>"
        "<footer><a href='/about'>about</a> © corp</footer></body></html>"
    )
    return html, "\n".join(paras)


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode("ascii")


# -------------------------------------------------------- corpus generator
def gen_docs(
    n_docs: int,
    seed: int = 42,
    giant_frac: float = 0.01,
    giant_spans: int = 200,
    with_edge_rows: bool = True,
) -> list[dict]:
    """Generate interleaved documents as plain dict rows
    ``{doc_id, spans:[{kind,text,media_ref,offset}]}``."""
    rng = random.Random(seed)
    rows: list[dict] = []
    for d in range(n_docs):
        doc_id = f"doc-{d:08d}"
        giant = rng.random() < giant_frac
        n_spans = rng.randint(50, giant_spans) if giant else rng.randint(1, 8)
        spans = []
        offset = 0
        for i in range(n_spans):
            offset += rng.randint(1, 5)  # strictly increasing, not dense
            kind = rng.choices(
                ["text", "html", "pdf", "image", "media"],
                weights=[50, 15, 10, 10, 15],
            )[0]
            text = None
            media_ref = None
            if kind == "text":
                nw = rng.randint(5, 2000) if giant else rng.randint(5, 120)
                text = " ".join(rng.choice(_WORDS) for _ in range(nw))
            elif kind == "html":
                text, _ = make_html(rng, n_paras=rng.randint(1, 4))
            elif kind == "pdf":
                pages = []
                for _ in range(rng.randint(1, 3)):
                    if rng.random() < 0.3:
                        pages.append({
                            "caption": " ".join(
                                rng.choice(_WORDS) for _ in range(6)
                            )
                        })
                    else:
                        pages.append({
                            "lines": [
                                " ".join(rng.choice(_WORDS) for _ in range(8))
                                for _ in range(rng.randint(1, 5))
                            ]
                        })
                text = _b64(make_pdf(pages))
            elif kind == "image":
                cap = " ".join(rng.choice(_WORDS) for _ in range(4)).upper()
                # ~15% of images have no caption → OCR fails → classifier
                # keyword becomes content (reference v2_util.go:85-91)
                text = _b64(make_png(caption=cap if rng.random() > 0.15 else None))
            else:  # media
                media_ref = f"ref-{doc_id}-{i}"
            spans.append(
                {"kind": kind, "text": text, "media_ref": media_ref,
                 "offset": offset}
            )
        rng.shuffle(spans)  # storage order != offset order (FIXTURES F1)
        rows.append({"doc_id": doc_id, "spans": spans})

    if with_edge_rows:
        rows.append({"doc_id": "doc-edge-empty", "spans": []})
        rows.append(
            {"doc_id": "doc-edge-media-only",
             "spans": [{"kind": "media", "text": None,
                        "media_ref": "ref-solo", "offset": 1}]}
        )
        rows.append(
            {"doc_id": "doc-edge-unsupported",
             "spans": [{"kind": "audio",
                        "text": _b64(b"OggS\x00\x02" + b"\x00" * 40),
                        "media_ref": None, "offset": 1}]}
        )
        rows.append(
            {"doc_id": "doc-edge-empty-payload",
             "spans": [{"kind": "text", "text": "", "media_ref": None,
                        "offset": 1}]}
        )
    return rows


def docs_to_spark(spark, rows: list[dict]):
    """Materialize corpus rows as a DataFrame with the authoritative
    input schema."""
    from lens_spark.schema import DOCUMENTS

    data = [
        (
            r["doc_id"],
            [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in r["spans"]
            ],
        )
        for r in rows
    ]
    return spark.createDataFrame(data, schema=DOCUMENTS)


# --------------------------------------------------------------- multimodal
def gen_media(n: int = 48, seed: int = 7) -> list[dict]:
    """Deterministic multimodal fixture corpus (media_id, kind, payload,
    media_ref): PNG images of varying dimensions (~70% captioned),
    LENSAV1 audio/video containers with varying frame counts, and one
    corrupt payload per 8 rows (drives the error/quarantine column).
    Shared verbatim by the Spark driver queries and the Spark-free
    oracle freezer (scripts/freeze_multimodal_oracle.py)."""
    import random

    from lens_spark.operators.multimodal import make_av_container

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        mid = f"m{i:04d}"
        if kind == "image":
            cap = f"fixture caption {i}" if rng.random() > 0.3 else None
            payload = make_png(caption=cap, width=1 + i % 5,
                               height=1 + (i // 3) % 4)
        else:
            frames = [bytes([(i + j) % 256]) * (8 + 3 * j)
                      for j in range(2 + i % 5)]
            payload = make_av_container(kind, frames)
        if i % 8 == 7:
            payload = b"\x00corrupt" + payload[:4]
        rows.append({"media_id": mid, "kind": kind, "payload": payload,
                     "media_ref": f"ref-{mid}"})
    return rows


def media_to_spark(spark, rows: list[dict]):
    from lens_spark.operators.multimodal import MEDIA

    return spark.createDataFrame(
        [(r["media_id"], r["kind"], r["payload"], r["media_ref"])
         for r in rows],
        schema=MEDIA,
    )


def gen_phash_media(n: int = 36, seed: int = 11) -> list[dict]:
    """Deterministic image corpus for the perceptual-hash (dHash)
    operators: 16x16 random-grayscale PNGs with PLANTED near-dups —
    every doc i % 3 == 1 is a ±40-on-four-pixels perturbation of its
    predecessor (small dHash Hamming distance — each 16x16→9x8 cell
    averages ~2x2 pixels, so a 40-level nudge flips at most a couple of
    gradient bits), every i % 6 == 5 is a
    verbatim re-encode of the grid two back (Hamming 0), and one
    corrupt payload per 12 rows drives the error lane. Shared verbatim
    by the Spark driver queries and the Spark-free freezer
    (scripts/freeze_phash_oracle.py)."""
    import random

    from lens_spark.extractors.ocr_stub import make_png

    rng = random.Random(seed)
    grids: list[list[bytearray]] = []
    rows = []
    for i in range(n):
        if i % 3 == 1 and grids:
            # near-dup of the previous image: ±40 on four pixels
            g = [bytearray(r) for r in grids[-1]]
            for _ in range(4):
                y, x = rng.randrange(16), rng.randrange(16)
                g[y][x] = max(0, min(255, g[y][x] + rng.choice((-40, 40))))
        elif i % 6 == 5 and len(grids) >= 2:
            # exact dup (same pixels as two back → Hamming 0)
            g = [bytearray(r) for r in grids[-2]]
        else:
            g = [bytearray(rng.randrange(256) for _ in range(16))
                 for _ in range(16)]
        grids.append(g)
        payload = make_png(pixels=[bytes(r) for r in g])
        if i % 12 == 11:
            payload = b"\x00corrupt" + payload[:4]
        rows.append({"media_id": f"p{i:04d}", "kind": "image",
                     "payload": payload, "media_ref": f"ref-p{i:04d}"})
    return rows

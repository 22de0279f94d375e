"""HTML main-content extraction — node/block flattening (Python side).

Target-only capability (BASELINE.json north_star): the reference has NO
HTML handling beyond the text/* identity passthrough (v2_util.go:73-75), so
this module is built from published boilerplate-removal heuristics
(Readability link-density, Boilerpipe text-density / block-fusion — see
PAPERS.md) rather than from reference code.

Two-stage vectorized design (SURVEY.md §2 E14):

1. **This module** flattens an HTML string into *atomic text blocks* —
   one row per deepest enclosing block element, with the stats the
   classifier needs: ``(block_id, tag, depth, text, n_chars,
   n_link_chars, n_tags, boiler)``. It runs inside ``mapInPandas``
   batches (stdlib ``html.parser``; lxml would slot in identically).
2. **operators/html_ops.py** scores and classifies the block table with
   pure DataFrame expressions (link density, text floor, window-smoothed
   block fusion) and reassembles kept blocks in document order.

:func:`strip_html` chains both steps in plain Python for the oracle and
for the in-UDF fast path; the classification rule is THE spec — the Spark
expressions in operators/html_ops.py must match it exactly (golden tests
enforce this).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html.parser import HTMLParser

BLOCK_TAGS = frozenset(
    "p div article section main aside nav header footer td li h1 h2 h3 h4 "
    "h5 h6 blockquote pre ul ol table body".split()
)
BOILER_TAGS = frozenset("nav header footer aside".split())
SKIP_TAGS = frozenset("script style template noscript head title".split())
VOID_TAGS = frozenset(
    "br hr img meta link input area base col embed source track wbr".split()
)

_WS_RE = re.compile(r"\s+")


@dataclass(slots=True)
class Block:
    block_id: int
    tag: str
    depth: int
    text: str
    n_chars: int
    n_link_chars: int
    n_tags: int
    boiler: bool


class _Flattener(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._stack: list[str] = []        # open tags
        self._block_stack: list[Block] = []
        self._skip = 0
        self._link = 0
        self._boiler = 0

    def _open_block(self, tag: str) -> None:
        b = Block(
            block_id=len(self.blocks),
            tag=tag,
            depth=len(self._stack),
            text="",
            n_chars=0,
            n_link_chars=0,
            n_tags=0,
            boiler=self._boiler > 0 or tag in BOILER_TAGS,
        )
        self.blocks.append(b)
        self._block_stack.append(b)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in VOID_TAGS:
            if self._block_stack and not self._skip:
                self._block_stack[-1].n_tags += 1
            return
        self._stack.append(tag)
        if tag in SKIP_TAGS:
            self._skip += 1
        if tag in BOILER_TAGS:
            self._boiler += 1
        if tag == "a":
            self._link += 1
        if tag in BLOCK_TAGS:
            self._open_block(tag)
        elif self._block_stack and not self._skip:
            self._block_stack[-1].n_tags += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        # lenient unwinding for malformed nesting
        while self._stack:
            top = self._stack.pop()
            if top in SKIP_TAGS:
                self._skip -= 1
            if top in BOILER_TAGS:
                self._boiler -= 1
            if top == "a":
                self._link -= 1
            if top in BLOCK_TAGS and self._block_stack:
                self._block_stack.pop()
            if top == tag:
                break

    def handle_data(self, data: str) -> None:
        if self._skip or not self._block_stack:
            return
        # " ".join(split()) ≡ _WS_RE.sub(" ", data).strip() — verified
        # identical over every Unicode codepoint; ~2x cheaper (r06)
        txt = " ".join(data.split())
        if not txt:
            return
        b = self._block_stack[-1]
        b.text = (b.text + " " + txt) if b.text else txt
        b.n_chars += len(txt)
        if self._link > 0:
            b.n_link_chars += len(txt)


# --------------------------------------------------------- fast tokenizer
# A regex tokenizer that emits the exact html.parser event stream for
# *clean* documents (the overwhelming real case: plain tags, quoted
# attributes, no entities) at a fraction of the stdlib parser's cost —
# html.parser's per-character goahead/parse_starttag machinery is ~75%
# of extraction CPU on the bench corpus (profiled r06). Anything the
# fast path cannot PROVE it handles identically (charrefs, comments,
# processing instructions, `<` inside script/style, tag soup, a
# trailing lone `<`) makes it bail and the document is re-parsed with
# html.parser, so the produced events are identical by construction for
# every input. Pinned by tests/test_html.py::test_fast_tokenizer_parity.
_FAST_TOKEN = re.compile(
    r"""(?P<data>[^<]+)
      | <(?P<end>/)(?P<etag>[a-zA-Z][a-zA-Z0-9]*)\s*>
      | <(?P<stag>[a-zA-Z][a-zA-Z0-9]*)
          (?:\s+[^\s<>"'=/]+(?:\s*=\s*(?:"[^"<]*"|'[^'<]*'|[^\s<>"'`=]+))?)*
          \s*(?P<selfclose>/?)>
      | (?P<decl><!(?:DOCTYPE|doctype)[^<>]*>)
    """,
    re.X,
)
_CDATA_TAGS = frozenset(("script", "style"))  # html.parser CDATA elements


def _fast_feed(f: "_Flattener", doc: str) -> bool:
    """Drive ``f`` with the fast tokenizer; True on full success, False
    when the document needs the stdlib parser (caller re-parses)."""
    if "&" in doc:  # charref conversion territory — html.parser's job
        return False
    pos = 0
    cdata: str | None = None
    for m in _FAST_TOKEN.finditer(doc):
        if m.start() != pos:  # unmatched region (tag soup, `<?`, …)
            return False
        pos = m.end()
        data = m.group("data")
        if data is not None:
            f.handle_data(data)
            continue
        if m.group("end"):
            etag = m.group("etag").lower()
            if cdata is not None:
                if etag != cdata:
                    # html.parser would treat this as CDATA text
                    return False
                cdata = None
            f.handle_endtag(etag)
            continue
        stag = m.group("stag")
        if stag is not None:
            if cdata is not None:  # `<x>` inside script/style is text
                return False
            tag = stag.lower()
            f.handle_starttag(tag, [])
            if m.group("selfclose"):
                f.handle_endtag(tag)  # handle_startendtag default
            elif tag in _CDATA_TAGS:
                cdata = tag
            continue
        # declaration: html.parser's handle_decl default is a no-op
    return pos == len(doc)


def html_blocks(doc: str) -> list[Block]:
    """Flatten an HTML document into atomic text blocks (document order)."""
    doc = doc or ""
    f = _Flattener()
    if not _fast_feed(f, doc):
        f = _Flattener()  # fast path may have partially fed events
        f.feed(doc)
        f.close()
    return [b for b in f.blocks if b.n_chars > 0]


def classify_blocks(
    blocks: list[Block],
    min_text_chars: int = 25,
    link_density_max: float = 0.33,
) -> list[bool]:
    """THE classification spec (mirrored by Spark expressions in
    operators/html_ops.py — keep in lockstep):

    keep_raw  = n_chars >= min_text_chars
                AND n_link_chars <= link_density_max * n_chars
                AND NOT boiler
    keep      = keep_raw OR (block-fusion rescue: non-boiler block with
                link density in bounds whose previous AND next blocks are
                both keep_raw)
    """
    raw = [
        (b.n_chars >= min_text_chars)
        and (b.n_link_chars <= link_density_max * b.n_chars)
        and not b.boiler
        for b in blocks
    ]
    keep = list(raw)
    for i, b in enumerate(blocks):
        if raw[i] or b.boiler:
            continue
        if b.n_link_chars > link_density_max * b.n_chars:
            continue
        prev_ok = i > 0 and raw[i - 1]
        next_ok = i + 1 < len(blocks) and raw[i + 1]
        if prev_ok and next_ok:
            keep[i] = True
    return keep


def strip_html(
    doc: str,
    min_text_chars: int = 25,
    link_density_max: float = 0.33,
) -> str:
    """Full main-content extraction for one document (oracle / in-UDF)."""
    blocks = html_blocks(doc)
    keep = classify_blocks(blocks, min_text_chars, link_density_max)
    return "\n".join(b.text for b, k in zip(blocks, keep) if k)

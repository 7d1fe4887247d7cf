"""PDF type detection (inspect → classify stage).

Faithful port of the reference detector (/root/reference/src/detector.rs):
page-sampling strategy (detector.rs:114-142), raw byte scan for Tj/TJ/Do
(detector.rs:283-320), image-XObject area analysis with the 500k-pixel
template threshold (detector.rs:328-399), and the exact classification
decision tree (detector.rs:184-211). Pure per-document function — invoked
per row inside a Ray ``map_batches`` UDF.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .objects import Document, PdfError, PdfString, Reference, Stream

TEMPLATE_IMAGE_THRESHOLD = 500_000  # pixels (detector.rs:331)

PDF_TYPE_TEXT_BASED = "TextBased"
PDF_TYPE_SCANNED = "Scanned"
PDF_TYPE_IMAGE_BASED = "ImageBased"
PDF_TYPE_MIXED = "Mixed"


@dataclass
class DetectionConfig:
    """detector.rs:46-63."""

    max_pages_to_sample: int = 5
    min_text_ops_per_page: int = 3
    text_page_ratio_threshold: float = 0.6


@dataclass
class PdfTypeResult:
    """detector.rs:26-42."""

    pdf_type: str
    page_count: int
    pages_sampled: int
    pages_with_text: int
    confidence: float
    title: Optional[str]
    ocr_recommended: bool


# Rust's u8::is_ascii_whitespace: space, \t, \n, \x0C, \r — NO vertical tab
_WS = frozenset(b"\t\n\x0c\r ")


def scan_content_for_text_operators(content: bytes) -> tuple[int, bool]:
    """Count Tj/TJ operators and flag Do (detector.rs:283-320).

    The reference walks byte-by-byte; we use ``bytes.find`` for speed with
    identical counting semantics: 'T' followed by 'j'/'J' followed by
    whitespace-or-EOF counts; 'D' 'o' followed by whitespace-or-EOF sets the
    image flag.
    """
    text_ops = 0
    n = len(content)
    i = content.find(b"T")
    while i != -1 and i < n:
        if i + 1 < n:
            nxt = content[i + 1]
            if nxt in (0x6A, 0x4A):  # 'j' or 'J'
                if i + 2 >= n or content[i + 2] in _WS:
                    text_ops += 1
        i = content.find(b"T", i + 1)
    has_images = False
    i = content.find(b"Do")
    while i != -1:
        if i + 2 >= n or content[i + 2] in _WS:
            has_images = True
            break
        i = content.find(b"Do", i + 1)
    return text_ops, has_images


def _sample_indices(total_pages: int, pages_to_sample: int) -> list[int]:
    """detector.rs:117-142: first + last + evenly spaced interior, sorted+deduped."""
    if pages_to_sample >= total_pages:
        return list(range(1, total_pages + 1))
    indices = [1]
    if pages_to_sample > 1:
        indices.append(total_pages)
    remaining = max(0, pages_to_sample - 2)
    if remaining > 0 and total_pages > 2:
        step = (total_pages - 2) // (remaining + 1)
        for i in range(1, remaining + 1):
            idx = 1 + step * i
            if 1 < idx < total_pages and idx not in indices:
                indices.append(idx)
    indices.sort()
    # dedup (already unique by construction, but mirror the reference)
    out = []
    for idx in indices:
        if not out or out[-1] != idx:
            out.append(idx)
    return out


def _analyze_page_content(doc: Document, page_ref: Reference) -> tuple[int, bool, bool, int]:
    """detector.rs:239-274. Returns (text_ops, has_images, has_template_image, area)."""
    text_ops = 0
    has_images = False
    for content_id in doc.get_page_contents(page_ref):
        try:
            obj = doc.resolve(content_id)
        except PdfError:
            continue
        if isinstance(obj, Stream):
            try:
                content = obj.decoded(doc)
            except PdfError:
                content = obj.raw  # detector.rs:249-252 raw fallback
            ops, imgs = scan_content_for_text_operators(content)
            text_ops += ops
            has_images = has_images or imgs
    found_images, total_area, has_template = _analyze_page_images(doc, page_ref)
    if found_images:
        has_images = True
    return text_ops, has_images, has_template, total_area


def _analyze_page_images(doc: Document, page_ref: Reference) -> tuple[bool, int, bool]:
    """detector.rs:328-399."""
    has_images = False
    total_area = 0
    has_template_image = False
    page_dict = doc.get_dict(page_ref)
    if not page_dict:
        return has_images, total_area, has_template_image
    resources = doc.get_dict(page_dict.get("Resources"))
    if not resources:
        return has_images, total_area, has_template_image
    xobject_dict = doc.get_dict(resources.get("XObject"))
    if not xobject_dict:
        return has_images, total_area, has_template_image
    for value in xobject_dict.values():
        if not isinstance(value, Reference):
            continue  # reference only follows references (detector.rs:354)
        try:
            xobj = doc.resolve(value)
        except PdfError:
            continue
        if not isinstance(xobj, Stream):
            continue
        if str(xobj.dict.get("Subtype", "")) != "Image":
            continue
        has_images = True
        try:
            width = int(doc.resolve(xobj.dict.get("Width", 0)) or 0)
            height = int(doc.resolve(xobj.dict.get("Height", 0)) or 0)
        except (PdfError, TypeError, ValueError):
            width = height = 0
        area = width * height
        total_area += area
        if area >= TEMPLATE_IMAGE_THRESHOLD:
            has_template_image = True
    return has_images, total_area, has_template_image


def get_document_title(doc: Document) -> Optional[str]:
    """detector.rs:402-422: trailer Info→Title, UTF-16BE on BOM else UTF-8-lossy."""
    info_ref = doc.trailer.get("Info")
    if not isinstance(info_ref, Reference):
        return None
    info = doc.get_dict(info_ref)
    if not info:
        return None
    title_obj = info.get("Title")
    try:
        title_obj = doc.resolve(title_obj)
    except PdfError:
        return None
    if isinstance(title_obj, PdfString):
        b = bytes(title_obj)
        if len(b) >= 2 and b[0] == 0xFE and b[1] == 0xFF:
            body = b[2:]
            if len(body) % 2:
                body = body[: len(body) - 1]
            return body.decode("utf-16-be", errors="replace")
        return b.decode("utf-8", errors="replace")
    return None


def detect_from_document(
    doc: Document, page_count: int, config: DetectionConfig
) -> PdfTypeResult:
    """detector.rs:105-225 — exact decision-tree port."""
    pages = doc.get_pages()
    total_pages = len(pages)
    pages_to_sample = min(config.max_pages_to_sample, total_pages)
    sample_indices = (
        _sample_indices(total_pages, pages_to_sample) if total_pages > 0 else []
    )

    pages_with_text = 0
    pages_with_images = 0
    pages_with_template_images = 0
    total_text_ops = 0

    for page_num in sample_indices:
        page_ref = pages.get(page_num)
        if page_ref is None:
            continue
        text_ops, has_images, has_template, _area = _analyze_page_content(doc, page_ref)
        if text_ops >= config.min_text_ops_per_page:
            pages_with_text += 1
        if has_images:
            pages_with_images += 1
        if has_template:
            pages_with_template_images += 1
        total_text_ops += text_ops

    pages_sampled = len(sample_indices)
    text_ratio = pages_with_text / pages_sampled if pages_sampled > 0 else 0.0
    has_template_images = pages_with_template_images > 0
    template_ratio = (
        pages_with_template_images / pages_sampled if pages_sampled > 0 else 0.0
    )

    # Classification decision tree (detector.rs:184-211); order matters.
    if has_template_images and pages_with_text > 0:
        ocr_recommended = True
        pdf_type, confidence = PDF_TYPE_MIXED, 0.5 + 0.3 * (1.0 - template_ratio)
    elif text_ratio >= config.text_page_ratio_threshold:
        ocr_recommended = False
        pdf_type, confidence = PDF_TYPE_TEXT_BASED, text_ratio
    elif pages_with_text == 0 and pages_with_images > 0:
        ocr_recommended = True
        if total_text_ops == 0:
            pdf_type, confidence = PDF_TYPE_SCANNED, 0.95
        else:
            pdf_type, confidence = PDF_TYPE_IMAGE_BASED, 0.8
    elif pages_with_text > 0 and pages_with_images > 0:
        ocr_recommended = True
        pdf_type, confidence = PDF_TYPE_MIXED, 0.7
    elif total_text_ops == 0:
        ocr_recommended = True
        pdf_type, confidence = PDF_TYPE_SCANNED, 0.9
    else:
        ocr_recommended = False
        pdf_type, confidence = PDF_TYPE_TEXT_BASED, max(text_ratio, 0.5)

    return PdfTypeResult(
        pdf_type=pdf_type,
        page_count=page_count,
        pages_sampled=pages_sampled,
        pages_with_text=pages_with_text,
        confidence=float(confidence),
        title=get_document_title(doc),
        ocr_recommended=ocr_recommended,
    )


def detect_pdf_type_mem(
    buffer: bytes, config: Optional[DetectionConfig] = None
) -> PdfTypeResult:
    """detector.rs:86-102."""
    config = config or DetectionConfig()
    doc = Document.load_mem(buffer)
    return detect_from_document(doc, doc.page_count(), config)

"""Synthetic Vietnamese report-text rendering for OCR training.

The reference ships pretrained PaddleOCR/VietOCR weights (reference
datasets/phenikaa/ocr.py:24-145); this framework trains its own detector and
recognizer, and the training data is rendered here: text lines drawn with
the system's DejaVu fonts (full Vietnamese diacritic coverage) over the
recognizer charset, plus composite report pages for detection training and
the end-to-end Phenikaa extraction test.

Everything is deterministic given a numpy Generator.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from spine_vision_tpu.models.textrec import VIETNAMESE_CHARSET

_FONT_DIR = Path("/usr/share/fonts/truetype/dejavu")
FONT_PATHS = tuple(
    sorted(str(p) for p in _FONT_DIR.glob("*.ttf"))
    if _FONT_DIR.exists()
    else []
)


def _holdout_font_paths() -> tuple[str, ...]:
    """DejaVu faces NEVER used in training (unseen-font generalization eval).

    matplotlib bundles the full DejaVu family; the faces whose filenames are
    not in the system dir used for training (Oblique / Italic / Display
    variants) are genuinely unseen glyph shapes with the same full
    Vietnamese diacritic coverage. The reference ships production OCR that
    handles arbitrary scans (reference datasets/phenikaa/ocr.py:24-145);
    holding out whole faces is this framework's stand-in for that
    generalization bar until real scanned pages exist.
    """
    try:
        import matplotlib
        from PIL import ImageFont

        mpl_dir = Path(matplotlib.__file__).parent / "mpl-data" / "fonts" / "ttf"
    except Exception:
        return ()
    trained = {Path(p).name for p in FONT_PATHS}

    def renders_charset(path: Path) -> bool:
        # The *Display faces in the bundle are glyph-less stubs — they
        # "render" blank masks for every character, which would score the
        # recognizer against empty images (CER 1.0 eval artifact, round 4).
        try:
            font = ImageFont.truetype(str(path), 22)
            return all(
                font.getmask(ch).getbbox() is not None for ch in "Nguyễn015/"
            )
        except Exception:
            return False

    return tuple(
        sorted(
            str(p)
            for p in mpl_dir.glob("DejaVu*.ttf")
            if p.name not in trained and renders_charset(p)
        )
    )


HOLDOUT_FONT_PATHS = _holdout_font_paths()

# Syllable pools for plausible Vietnamese patient names (diacritic-heavy on
# purpose — the recognizer must carry the full charset).
SURNAMES = (
    "Nguyễn", "Trần", "Lê", "Phạm", "Hoàng", "Huỳnh", "Phan", "Vũ", "Võ",
    "Đặng", "Bùi", "Đỗ", "Hồ", "Ngô", "Dương", "Lý", "Đào", "Trịnh",
)
MIDDLE_NAMES = ("Văn", "Thị", "Hữu", "Đức", "Công", "Quang", "Minh", "Ngọc", "Thu", "Xuân")
GIVEN_NAMES = (
    "An", "Bình", "Châu", "Dũng", "Giang", "Hà", "Hải", "Hạnh", "Hiếu",
    "Hương", "Khánh", "Lan", "Linh", "Long", "Mai", "Nam", "Nga", "Phúc",
    "Phương", "Quân", "Sơn", "Thảo", "Thắng", "Trang", "Tuấn", "Tùng",
    "Uyên", "Việt", "Yến", "Đạt",
)

FIELD_LABELS = (
    "Họ tên người bệnh",
    "Ngày sinh",
    "Số phiếu",
    "Giới tính",
    "Địa chỉ",
    "Chẩn đoán",
    "Bác sĩ chỉ định",
)

_CHARS = np.array(list(VIETNAMESE_CHARSET))


def sample_name(rng: np.random.Generator) -> str:
    parts = [
        SURNAMES[rng.integers(len(SURNAMES))],
        MIDDLE_NAMES[rng.integers(len(MIDDLE_NAMES))],
        GIVEN_NAMES[rng.integers(len(GIVEN_NAMES))],
    ]
    if rng.random() < 0.3:
        parts.insert(2, GIVEN_NAMES[rng.integers(len(GIVEN_NAMES))])
    return " ".join(parts)


def sample_date(rng: np.random.Generator) -> str:
    return (
        f"{rng.integers(1, 29):02d}/{rng.integers(1, 13):02d}/"
        f"{rng.integers(1940, 2015)}"
    )


def sample_line_text(rng: np.random.Generator, max_chars: int = 36) -> str:
    """Field-distribution text mixture for recognizer training."""
    kind = rng.random()
    if kind < 0.25:
        text = sample_name(rng)
    elif kind < 0.40:
        text = sample_date(rng)
    elif kind < 0.52:
        text = str(rng.integers(10000, 10**9))  # report / patient IDs
    elif kind < 0.72:
        label = FIELD_LABELS[rng.integers(len(FIELD_LABELS))]
        value = (
            sample_name(rng)
            if "tên" in label
            else sample_date(rng)
            if "sinh" in label
            else str(rng.integers(1000, 10**7))
        )
        text = f"{label}: {value}"
    else:
        n = int(rng.integers(3, max_chars))
        text = "".join(_CHARS[rng.integers(0, len(_CHARS), size=n)])
    text = text.strip()[:max_chars].strip()
    return text or "0"


def render_line(
    text: str,
    rng: np.random.Generator,
    height: int = 32,
    width: int = 256,
    augment: bool = True,
    fonts: tuple[str, ...] | None = None,
) -> np.ndarray:
    """Render one text line: dark glyphs on a light background.

    Returns float32 [height, width] in [0, 255] — the same polarity and
    scale the page-rectification path feeds the recognizer.
    """
    from PIL import Image, ImageDraw, ImageFilter, ImageFont

    fonts = fonts or FONT_PATHS
    font_path = fonts[int(rng.integers(len(fonts)))]
    size = int(rng.integers(18, 27)) if augment else 22
    font = ImageFont.truetype(font_path, size)

    canvas_w = width * 2
    img = Image.new("L", (canvas_w, height), color=255)
    draw = ImageDraw.Draw(img)
    x0 = int(rng.integers(1, 8)) if augment else 3
    # Vertical centering against the font's reported bbox.
    bbox = draw.textbbox((0, 0), text, font=font)
    y0 = max(0, (height - (bbox[3] - bbox[1])) // 2 - bbox[1])
    draw.text((x0, y0), text, fill=0, font=font)

    if augment:
        # Stroke-weight augmentation: unseen faces differ in stroke width
        # and contrast (italic diagonals run thinner than sheared-upright
        # strokes). A 3x3 min/max filter on the dark-on-light rendering
        # bolds/thins every stroke by ~1 px — the weight axis the six
        # trained faces (Book/Bold only) cannot span.
        weight_draw = rng.random()
        if weight_draw < 0.2:
            img = img.filter(ImageFilter.MinFilter(3))  # bolder
        elif weight_draw < 0.35:
            # Thinner: a FULL 3x3 max erases the 2 px stems these sizes
            # render (measured: ~every thinned line went blank) — blend
            # toward the eroded image for a sub-pixel thinning instead.
            alpha = rng.uniform(0.35, 0.65)
            thin = np.asarray(img.filter(ImageFilter.MaxFilter(3)), np.float32)
            base = np.asarray(img, np.float32)
            img = Image.fromarray(
                np.clip(base + alpha * (thin - base), 0, 255).astype(np.uint8)
            )

    slant = 0.0
    if augment and rng.random() < 0.5:
        # Glyph-slant augmentation: unseen oblique/italic faces slant at
        # ~tan(11 deg) ~= 0.19, far outside the page-level degrade shear
        # (+-0.06); shearing the rendered glyphs covers those shapes without
        # ever training on the held-out font files (round-4 holdout eval:
        # CER 0.008 in-font vs 0.30 unseen-font before this).
        slant = float(rng.uniform(-0.25, 0.25))
        img = img.transform(
            (canvas_w, height),
            Image.AFFINE,
            (1.0, slant, -slant * height / 2.0, 0.0, 1.0, 0.0),
            Image.BILINEAR,
            fillcolor=255,
        )

    used_w = min(
        canvas_w, bbox[2] - bbox[0] + x0 + 6 + int(abs(slant) * height / 2.0)
    )
    arr_img = img.crop((0, 0, max(used_w, 8), height))
    # Squeeze-or-pad to the fixed patch width (rectified patches are
    # stretched the same way by rectify_polygons).
    arr_img = arr_img.resize((width, height), Image.BILINEAR)
    if augment and rng.random() < 0.3:
        arr_img = arr_img.filter(ImageFilter.GaussianBlur(radius=0.6))
    arr = np.asarray(arr_img, dtype=np.float32)

    if augment:
        contrast = 0.7 + 0.5 * rng.random()
        brightness = rng.uniform(-20.0, 20.0)
        arr = np.clip((arr - 128.0) * contrast + 128.0 + brightness, 0, 255)
        arr = np.clip(arr + rng.normal(0.0, 6.0, arr.shape), 0, 255)
    return arr.astype(np.float32)


def render_line_mpl(
    text: str,
    height: int = 32,
    width: int = 256,
    fontsize_px: float = 22.0,
    style: str = "normal",
    family: str = "DejaVu Sans",
) -> np.ndarray:
    """Render one text line through matplotlib's Agg text stack.

    UNSEEN-RENDERER evaluation surface: every training line is rasterized by
    PIL (``render_line``); this path goes through matplotlib's own freetype
    layout/hinting/antialiasing pipeline instead — different kerning,
    subpixel positioning, stroke contrast, and glyph scaling for the same
    text. The reference ships production OCR tested on real scans
    (reference datasets/phenikaa/ocr.py:24-145); scoring CER on a second,
    independent rasterizer is this framework's renderer-generalization bar
    (complements the unseen-FONT holdout, which varies glyph shapes instead).

    Returns float32 [height, width] in [0, 255], dark glyphs on light.
    """
    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure
    from PIL import Image

    dpi = 72.0  # 1 pt == 1 px so fontsize_px maps directly
    canvas_w = width * 2
    fig = Figure(figsize=(canvas_w / dpi, height / dpi), dpi=dpi)
    fig.patch.set_facecolor("white")
    canvas = FigureCanvasAgg(fig)
    fig.text(
        3.0 / canvas_w,
        0.5,
        text,
        fontsize=fontsize_px,
        family=family,
        style=style,
        va="center",
        ha="left",
        color="black",
    )
    canvas.draw()
    rgba = np.asarray(canvas.buffer_rgba())
    gray = rgba[..., :3].astype(np.float32).mean(axis=-1)

    cols = np.where(gray.min(axis=0) < 160)[0]
    used_w = int(cols.max()) + 6 if cols.size else 8
    img = Image.fromarray(
        np.clip(gray, 0, 255).astype(np.uint8)[:, : max(used_w, 8)]
    )
    # Same squeeze-or-pad to the fixed patch width as render_line /
    # rectify_polygons.
    img = img.resize((width, height), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32)


def recognition_eval_batch_mpl(
    rng: np.random.Generator,
    n: int,
    width: int = 256,
    style: str = "normal",
) -> tuple[np.ndarray, list[str]]:
    """Evaluation-only batch rendered by matplotlib (see render_line_mpl).

    Font size varies over the training range; no degradation is applied —
    the variable under test is the rasterizer itself.
    """
    texts = [sample_line_text(rng) for _ in range(n)]
    images = np.stack(
        [
            render_line_mpl(
                t,
                width=width,
                fontsize_px=float(rng.integers(18, 27)),
                style=style,
            )
            for t in texts
        ]
    )
    return images.astype(np.float32), texts


def encode_text(text: str, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Text -> (padded CTC target ids [max_len], padding mask [max_len]).

    Character i of the charset maps to logit id i + 1 (0 = blank).
    """
    ids = [VIETNAMESE_CHARSET.index(c) + 1 for c in text if c in VIETNAMESE_CHARSET]
    ids = ids[:max_len]
    out = np.zeros(max_len, dtype=np.int32)
    out[: len(ids)] = ids
    pad = np.ones(max_len, dtype=np.float32)
    pad[: len(ids)] = 0.0
    return out, pad


def recognition_batch(
    rng: np.random.Generator,
    n: int,
    height: int = 32,
    width: int = 256,
    max_len: int = 40,
    augment: bool = True,
    degrade: str | None = None,
    degrade_p: float = 1.0,
    fonts: tuple[str, ...] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[str]]:
    """Rendered lines + CTC targets: (images [n,h,w], ids, pad, texts).

    ``degrade``: optional scan-degradation profile ("mild"/"hard",
    :func:`degrade_image`) applied to each line with prob ``degrade_p``.
    """
    texts = [sample_line_text(rng) for _ in range(n)]

    def render(t: str) -> np.ndarray:
        arr = render_line(t, rng, height, width, augment=augment, fonts=fonts)
        if degrade is not None and rng.random() < degrade_p:
            arr = degrade_image(arr, rng, profile=degrade)
        return arr

    images = np.stack([render(t) for t in texts])
    encoded = [encode_text(t, max_len) for t in texts]
    ids = np.stack([e[0] for e in encoded])
    pad = np.stack([e[1] for e in encoded])
    return images, ids, pad, texts


def detection_page(
    rng: np.random.Generator,
    page_hw: tuple[int, int] = (320, 448),
    max_lines: int = 8,
    augment: bool = True,
    degrade: str | None = None,
    degrade_p: float = 1.0,
    fonts: tuple[str, ...] | None = None,
) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Composite page of text lines: (page [H,W], boxes [N,4] xyxy, texts).

    Lines are placed on a jittered row grid so boxes never overlap.
    ``degrade``: optional scan-degradation profile; the returned boxes are
    mapped through the same geometric transform.
    """
    from PIL import Image, ImageDraw, ImageFont

    fonts = fonts or FONT_PATHS
    h, w = page_hw
    img = Image.new("L", (w, h), color=int(rng.integers(235, 256)))
    draw = ImageDraw.Draw(img)
    boxes: list[tuple[float, float, float, float]] = []
    texts: list[str] = []
    n_lines = int(rng.integers(3, max_lines + 1))
    row_height = h // max_lines
    rows = rng.permutation(max_lines)[:n_lines]
    for row in sorted(rows):
        text = sample_line_text(rng, max_chars=28)
        font_path = fonts[int(rng.integers(len(fonts)))]
        size = int(rng.integers(14, 22)) if augment else 18
        font = ImageFont.truetype(font_path, size)
        bbox = draw.textbbox((0, 0), text, font=font)
        tw = bbox[2] - bbox[0]
        th = bbox[3] - bbox[1]
        if tw >= w - 16:
            text = text[: max(4, len(text) // 2)]
            bbox = draw.textbbox((0, 0), text, font=font)
            tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
        # Per-line glyph-slant augmentation (same rationale as render_line:
        # cover oblique/italic glyph shapes without the held-out faces).
        slant = (
            float(rng.uniform(-0.25, 0.25))
            if augment and rng.random() < 0.5
            else 0.0
        )
        spread = int(abs(slant) * th) + (2 if slant else 0)
        line_w = tw + spread
        if line_w >= w - 16:
            slant, spread, line_w = 0.0, 0, tw
        x = int(rng.integers(8, max(9, w - line_w - 8)))
        y = int(row * row_height + rng.integers(2, max(3, row_height - th - 2)))
        fill = int(rng.integers(0, 40))
        if slant:
            tmp = Image.new("L", (line_w, th), color=255)
            ImageDraw.Draw(tmp).text(
                (spread // 2 - bbox[0], -bbox[1]), text, fill=fill, font=font
            )
            tmp = tmp.transform(
                (line_w, th),
                Image.AFFINE,
                (1.0, slant, -slant * th / 2.0, 0.0, 1.0, 0.0),
                Image.BILINEAR,
                fillcolor=255,
            )
            region = img.crop((x, y, x + line_w, y + th))
            img.paste(
                Image.fromarray(
                    np.minimum(
                        np.asarray(region, np.uint8), np.asarray(tmp, np.uint8)
                    )
                ),
                (x, y),
            )
        else:
            draw.text((x - bbox[0], y - bbox[1]), text, fill=fill, font=font)
        boxes.append((x - 2, y - 2, x + line_w + 2, y + th + 2))
        texts.append(text)
    arr = np.asarray(img, dtype=np.float32)
    if augment:
        arr = np.clip(arr + rng.normal(0.0, 5.0, arr.shape), 0, 255)
    boxes_arr = np.asarray(boxes, dtype=np.float32)
    if degrade is not None and rng.random() < degrade_p:
        arr, boxes_arr = degrade_image(arr, rng, profile=degrade, boxes=boxes_arr)
    return arr.astype(np.float32), boxes_arr, texts


def detection_target(
    boxes: np.ndarray, page_hw: tuple[int, int], scale: int = 2, shrink: float = 0.3
) -> np.ndarray:
    """Shrunk-box probability target at 1/scale resolution (DB formulation:
    the model learns text *kernels*; extract_boxes_from_probmap dilates by
    the matching unclip ratio)."""
    h, w = page_hw[0] // scale, page_hw[1] // scale
    target = np.zeros((h, w), dtype=np.float32)
    for x1, y1, x2, y2 in np.asarray(boxes, dtype=np.float32) / scale:
        bw, bh = x2 - x1, y2 - y1
        sx, sy = bw * shrink / 2.0, bh * shrink / 2.0
        xa, xb = int(round(x1 + sx)), int(round(x2 - sx))
        ya, yb = int(round(y1 + sy)), int(round(y2 - sy))
        target[max(ya, 0) : max(yb, 0), max(xa, 0) : max(xb, 0)] = 1.0
    return target


def render_report_page(
    patient_name: str,
    birthday: str,
    report_id: str,
    rng: np.random.Generator,
    page_hw: tuple[int, int] = (448, 640),
) -> np.ndarray:
    """A minimal fake Phenikaa report page with the three extraction fields
    (reference field patterns, phenikaa/__init__.py:34-37) — used by the
    end-to-end extraction test and CER evaluation."""
    from PIL import Image, ImageDraw, ImageFont

    h, w = page_hw
    img = Image.new("L", (w, h), color=250)
    draw = ImageDraw.Draw(img)
    font = ImageFont.truetype(FONT_PATHS[0], 20)
    lines = [
        "BỆNH VIỆN ĐẠI HỌC PHENIKAA",
        "PHIẾU CHỈ ĐỊNH CHỤP MRI",
        f"Số phiếu: {report_id}",
        f"Họ tên người bệnh: {patient_name}",
        f"Ngày sinh: {birthday}",
        "Chẩn đoán: Thoát vị đĩa đệm",
    ]
    y = 24
    for line in lines:
        draw.text((24, y), line, fill=10, font=font)
        y += 42
    return np.asarray(img, dtype=np.float32)


def render_report_page_variant(
    patient_name: str,
    birthday: str,
    report_id: str,
    rng: np.random.Generator,
    page_hw: tuple[int, int] = (448, 640),
    font_path: str | None = None,
) -> np.ndarray:
    """An UNSEEN-LAYOUT fake report page (evaluation only — never trained on).

    Differs structurally from :func:`render_report_page`, which training and
    the primary e2e test use: a letterhead with clutter lines, a boxed
    report number in the top-right corner, label/value pairs at mixed
    indentation with varying separator spacing, shuffled field order, a
    horizontal rule, and per-line font sizes. Rendered with a held-out font
    when one exists. Scores the detect->rectify->recognize->fuzzy-extract
    chain on a layout distribution the models never saw (the reference
    ships production OCR that handles arbitrary report layouts, reference
    datasets/phenikaa/ocr.py:24-145).
    """
    from PIL import Image, ImageDraw, ImageFont

    h, w = page_hw
    path = font_path or (
        HOLDOUT_FONT_PATHS[0] if HOLDOUT_FONT_PATHS else FONT_PATHS[0]
    )
    img = Image.new("L", (w, h), color=252)
    draw = ImageDraw.Draw(img)

    def text(x: int, y: int, s: str, size: int) -> None:
        draw.text((x, y), s, fill=12, font=ImageFont.truetype(path, size))

    # Letterhead + clutter the extractor must ignore.
    text(20, 14, "SỞ Y TẾ HÀ NỘI", 15)
    text(20, 36, "BỆNH VIỆN ĐẠI HỌC PHENIKAA", 19)
    text(20, 62, "Đường Nguyễn Trác, Hà Đông", 13)
    # Boxed report number top-right (ID separated from its label).
    draw.rectangle((w - 220, 16, w - 24, 78), outline=60, width=2)
    text(w - 208, 24, "Số phiếu:", 14)
    text(w - 208, 46, report_id, 20)
    draw.line((20, 92, w - 20, 92), fill=80, width=2)
    text(170, 104, "PHIẾU CHỈ ĐỊNH CHỤP MRI", 18)

    # Label/value pairs: shuffled order, mixed indentation and separator
    # spacing (never all identical to the trained layout's "label: value").
    fields = [
        ("Họ tên người bệnh", patient_name),
        ("Ngày sinh", birthday),
        ("Giới tính", "Nữ" if rng.random() < 0.5 else "Nam"),
        ("Địa chỉ", "Số 12 Tô Hiệu, Hà Đông, Hà Nội"),
        ("Chẩn đoán", "Thoát vị đĩa đệm L4/L5"),
    ]
    order = rng.permutation(len(fields))
    y = 148
    for idx in order:
        label, value = fields[idx]
        indent = 24 if idx % 2 == 0 else 48
        sep = ":" if rng.random() < 0.5 else " :"
        size = int(rng.integers(16, 21))
        text(indent, y, f"{label}{sep} {value}", size)
        y += int(rng.integers(38, 50))
    text(24, y + 10, f"Ngày chỉ định: {sample_date(rng)}", 14)
    return np.asarray(img, dtype=np.float32)


# ---------------------------------------------------------------------------
# Scan-style degradation (round 3): geometric + photometric artifacts so the
# OCR numbers mean something off the clean rendering distribution. The
# reference leans on production PaddleOCR/VietOCR robustness (reference
# datasets/phenikaa/ocr.py:24-145); here the robustness is trained in.
#
# Profiles: "mild" mirrors what training adds on top of the clean renderer;
# "hard" is the held-out evaluation profile — distributionally harsher
# (bigger rotations, stronger compression, more clutter; parameter ranges
# overlap, so it is shifted rather than disjoint), giving eval CER/recall
# a generalization signal the clean numbers can't.
# ---------------------------------------------------------------------------

DEGRADE_PROFILES = {
    "mild": {
        "rotate_deg": 2.2,
        "shear": 0.06,
        "perspective": 0.012,
        "jpeg_q": (40, 90),
        "salt_pepper": 0.004,
        "vignette": 0.2,
        "lines": 2,
        "p_geom": 0.7,
        "p_jpeg": 0.6,
        "p_lines": 0.4,
    },
    "hard": {
        "rotate_deg": 3.0,
        "shear": 0.08,
        "perspective": 0.015,
        "jpeg_q": (30, 60),
        "salt_pepper": 0.006,
        "vignette": 0.3,
        "lines": 3,
        "p_geom": 1.0,
        "p_jpeg": 1.0,
        "p_lines": 0.7,
    },
}


def _affine_coeffs(width, height, rot_rad, shear_x, persp):
    """Inverse-map coefficients for PIL PERSPECTIVE transform: output (x,y)
    -> input (ax+by+c)/(gx+hy+1), (dx+ey+f)/(gx+hy+1). Rotation about the
    image center + x-shear + a small projective term."""
    import math

    cx, cy = width / 2.0, height / 2.0
    cos, sin = math.cos(rot_rad), math.sin(rot_rad)
    # inverse rotation (output->input) with shear folded in
    a, b = cos, sin + shear_x
    d, e = -sin, cos
    c = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    return (a, b, c, d, e, f, persp / max(width, 1), persp / max(height, 1))


def degrade_image(
    arr: np.ndarray,
    rng: np.random.Generator,
    profile: str = "mild",
    boxes: np.ndarray | None = None,
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Apply scan-style degradation to a rendered line/page.

    Args:
        arr: float32 [H, W] in [0, 255] (light background, dark glyphs).
        rng: numpy Generator (deterministic pipeline).
        profile: "mild" (training) or "hard" (held-out eval).
        boxes: optional [N, 4] xyxy text boxes; when given they are mapped
            through the same geometric transform (axis-aligned hull) and
            returned alongside the image.

    Returns:
        degraded image, or (image, boxes) when boxes were given.
    """
    from PIL import Image

    p = DEGRADE_PROFILES[profile]
    h, w = arr.shape
    out_boxes = None if boxes is None else np.asarray(boxes, np.float64).copy()

    # Geometric: rotation + shear + slight perspective via one transform.
    if rng.random() < p["p_geom"]:
        rot = np.deg2rad(rng.uniform(-p["rotate_deg"], p["rotate_deg"]))
        shear = rng.uniform(-p["shear"], p["shear"])
        persp = rng.uniform(-p["perspective"], p["perspective"])
        coeffs = _affine_coeffs(w, h, rot, shear, persp)
        img = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8), "L")
        img = img.transform(
            (w, h), Image.PERSPECTIVE, coeffs, Image.BILINEAR, fillcolor=245
        )
        arr = np.asarray(img, dtype=np.float32)
        if out_boxes is not None and len(out_boxes):
            a, b, c, d, e, f, g, hh = coeffs
            # coeffs define the output->source homography; push box corners
            # FORWARD through its exact inverse. (An affine-only inverse
            # drifts by up to a text-line height at page corners under the
            # projective term, painting detection targets off the glyphs.)
            m = np.array([[a, b, c], [d, e, f], [g, hh, 1.0]])
            minv = np.linalg.inv(m)
            corners = np.stack(
                [
                    out_boxes[:, [0, 1]],
                    out_boxes[:, [2, 1]],
                    out_boxes[:, [0, 3]],
                    out_boxes[:, [2, 3]],
                ],
                axis=1,
            )  # [N, 4, 2]
            ones = np.ones((*corners.shape[:2], 1))
            hom = np.concatenate([corners, ones], axis=-1) @ minv.T
            xs = hom[..., 0] / hom[..., 2]
            ys = hom[..., 1] / hom[..., 2]
            out_boxes = np.stack(
                [xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1
            )

    # Bleed-through / ruled lines.
    if rng.random() < p["p_lines"]:
        for _ in range(int(rng.integers(1, p["lines"] + 1))):
            shade = float(rng.uniform(120, 200))
            if rng.random() < 0.5:
                y = int(rng.integers(0, h))
                arr[y : y + 1, :] = np.minimum(arr[y : y + 1, :], shade)
            else:
                x = int(rng.integers(0, w))
                arr[:, x : x + 1] = np.minimum(arr[:, x : x + 1], shade)

    # Vignetting (radial illumination falloff).
    if p["vignette"] > 0:
        strength = rng.uniform(0.0, p["vignette"])
        yy, xx = np.mgrid[0:h, 0:w]
        r2 = ((yy - h / 2) / (h / 2)) ** 2 + ((xx - w / 2) / (w / 2)) ** 2
        arr = arr * (1.0 - strength * r2 / 2.0)

    # Salt & pepper.
    if p["salt_pepper"] > 0:
        mask = rng.random(arr.shape)
        arr = np.where(mask < p["salt_pepper"] / 2, 0.0, arr)
        arr = np.where(mask > 1.0 - p["salt_pepper"] / 2, 255.0, arr)

    # JPEG round trip (blocking artifacts).
    if rng.random() < p["p_jpeg"]:
        import io as _io

        q = int(rng.integers(p["jpeg_q"][0], p["jpeg_q"][1] + 1))
        buf = _io.BytesIO()
        Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8), "L").save(
            buf, format="JPEG", quality=q
        )
        buf.seek(0)
        arr = np.asarray(Image.open(buf), dtype=np.float32)

    return arr.astype(np.float32) if out_boxes is None else (
        arr.astype(np.float32),
        out_boxes.astype(np.float32),
    )

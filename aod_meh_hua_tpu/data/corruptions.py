"""Image-corruption benchmark transforms (VOC-scoped robustness tests).

The reference's tools/analysis_tools/test_robustness.py applies the 15
"benchmark" corruptions of Hendrycks & Dietterich (ICLR 2019,
"Benchmarking Neural Network Robustness to Common Corruptions and
Perturbations") via the `imagecorruptions` package at severities 1-5
(/root/reference/tools/analysis_tools/test_robustness.py:216-247).
These are independent numpy/cv2 re-implementations of the standard
recipes (noise, blur, weather, digital families) — no GPU, no extra
deps; severity tables follow the published benchmark's spirit rather
than byte-matching the original assets (e.g. frost is procedural
because the original ships texture photos).

All functions take/return uint8 BGR HWC and are deterministic given the
rng. Severity s in {1..5}.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _as_float(img):
    return img.astype(np.float32) / 255.0


def _to_uint8(x):
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


# ----- noise family -----

def gaussian_noise(img, severity, rng):
    c = [0.08, 0.12, 0.18, 0.26, 0.38][severity - 1]
    x = _as_float(img)
    return _to_uint8(x + rng.normal(size=x.shape) * c)


def shot_noise(img, severity, rng):
    c = [60, 25, 12, 5, 3][severity - 1]
    x = _as_float(img)
    return _to_uint8(rng.poisson(x * c) / float(c))


def impulse_noise(img, severity, rng):
    """Salt-and-pepper on a fraction of pixels."""
    amount = [0.03, 0.06, 0.09, 0.17, 0.27][severity - 1]
    out = img.copy()
    mask = rng.rand(*img.shape[:2])
    out[mask < amount / 2] = 0
    out[mask > 1 - amount / 2] = 255
    return out


def speckle_noise(img, severity, rng):
    c = [0.15, 0.2, 0.35, 0.45, 0.6][severity - 1]
    x = _as_float(img)
    return _to_uint8(x + x * rng.normal(size=x.shape) * c)


# ----- blur family -----

def _disk_kernel(radius):
    size = 2 * int(radius) + 1
    y, x = np.ogrid[-int(radius):int(radius) + 1, -int(radius):int(radius) + 1]
    k = ((x * x + y * y) <= radius * radius).astype(np.float32)
    return k / k.sum()


def defocus_blur(img, severity, rng=None):
    radius = [3, 4, 6, 8, 10][severity - 1]
    return cv2.filter2D(img, -1, _disk_kernel(radius))


def gaussian_blur(img, severity, rng=None):
    sigma = [1, 2, 3, 4, 6][severity - 1]
    return cv2.GaussianBlur(img, (0, 0), sigma)


def glass_blur(img, severity, rng):
    """Local pixel shuffling then gaussian blur (single-pass variant)."""
    sigma, max_delta = [(0.7, 1), (0.9, 2), (1.0, 2), (1.1, 3), (1.5, 4)][severity - 1]
    h, w = img.shape[:2]
    dy = rng.randint(-max_delta, max_delta + 1, (h, w))
    dx = rng.randint(-max_delta, max_delta + 1, (h, w))
    yy = np.clip(np.arange(h)[:, None] + dy, 0, h - 1)
    xx = np.clip(np.arange(w)[None, :] + dx, 0, w - 1)
    shuffled = img[yy, xx]
    return cv2.GaussianBlur(shuffled, (0, 0), sigma)


def motion_blur(img, severity, rng):
    length = [9, 13, 17, 23, 29][severity - 1]
    angle = float(rng.uniform(-45, 45))
    k = np.zeros((length, length), np.float32)
    k[length // 2] = 1.0
    rot = cv2.getRotationMatrix2D((length / 2 - 0.5, length / 2 - 0.5), angle, 1.0)
    k = cv2.warpAffine(k, rot, (length, length))
    k /= k.sum()
    return cv2.filter2D(img, -1, k)


def zoom_blur(img, severity, rng=None):
    factors = {1: (1.0, 1.06), 2: (1.0, 1.11), 3: (1.0, 1.16),
               4: (1.0, 1.21), 5: (1.0, 1.26)}[severity]
    h, w = img.shape[:2]
    acc = _as_float(img).copy()
    n = 1
    for z in np.arange(factors[0] + 0.02, factors[1], 0.02):
        zh, zw = int(np.ceil(h / z)), int(np.ceil(w / z))
        y0, x0 = (h - zh) // 2, (w - zw) // 2
        crop = img[y0:y0 + zh, x0:x0 + zw]
        acc += _as_float(cv2.resize(crop, (w, h), interpolation=cv2.INTER_LINEAR))
        n += 1
    return _to_uint8(acc / n)


# ----- weather family -----

def snow(img, severity, rng):
    amount, brighten = [(0.05, 0.3), (0.1, 0.3), (0.15, 0.4),
                        (0.25, 0.45), (0.3, 0.5)][severity - 1]
    h, w = img.shape[:2]
    layer = (rng.rand(h, w) < amount).astype(np.float32)
    layer = cv2.GaussianBlur(layer, (0, 0), 1.5)
    layer = np.clip(layer * 4.0, 0, 1)[..., None]
    x = _as_float(img)
    x = np.clip(x + brighten * 0.5, 0, 1) * 0.9 + x * 0.1  # whiten scene
    return _to_uint8(x * (1 - layer) + layer)


def frost(img, severity, rng):
    """Procedural frost: blurred high-contrast noise crystals overlay."""
    mix = [0.25, 0.35, 0.45, 0.55, 0.65][severity - 1]
    h, w = img.shape[:2]
    noise = rng.rand(h // 4 + 1, w // 4 + 1).astype(np.float32)
    noise = cv2.resize(noise, (w, h), interpolation=cv2.INTER_CUBIC)
    crystals = np.clip((noise - 0.55) * 4.0, 0, 1)
    crystals = cv2.GaussianBlur(crystals, (0, 0), 1.0)[..., None]
    frost_rgb = np.concatenate([crystals * 0.95, crystals * 0.97, crystals], -1)
    x = _as_float(img)
    return _to_uint8(x * (1 - mix * crystals) + frost_rgb * mix)


def fog(img, severity, rng):
    fog_amt, decay = [(1.5, 2.0), (2.0, 2.0), (2.5, 1.7),
                      (2.5, 1.5), (3.0, 1.4)][severity - 1]
    h, w = img.shape[:2]
    # plasma-ish fog: multi-octave smoothed noise
    acc = np.zeros((h, w), np.float32)
    for octave, amp in [(8, 1.0), (16, 0.5), (32, 0.25)]:
        n = rng.rand(h // octave + 1, w // octave + 1).astype(np.float32)
        acc += amp * cv2.resize(n, (w, h), interpolation=cv2.INTER_CUBIC)
    acc = (acc - acc.min()) / (acc.max() - acc.min() + 1e-9)
    x = _as_float(img)
    fog_layer = (fog_amt / 3.0) * acc[..., None] ** (decay / 2.0)
    return _to_uint8((x + fog_layer) / (1 + fog_amt / 3.0 * 0.8))


def brightness(img, severity, rng=None):
    c = [0.1, 0.2, 0.3, 0.4, 0.5][severity - 1]
    return _to_uint8(np.clip(_as_float(img) + c, 0, 1))


# ----- digital family -----

def contrast(img, severity, rng=None):
    c = [0.4, 0.3, 0.2, 0.1, 0.05][severity - 1]
    x = _as_float(img)
    mean = x.mean(axis=(0, 1), keepdims=True)
    return _to_uint8((x - mean) * c + mean)


def elastic_transform(img, severity, rng):
    alpha, sigma = [(1.5, 8), (2.0, 7), (3.0, 6), (4.0, 5), (5.0, 4)][severity - 1]
    h, w = img.shape[:2]
    dx = cv2.GaussianBlur((rng.rand(h, w).astype(np.float32) * 2 - 1), (0, 0), sigma) * alpha * 4
    dy = cv2.GaussianBlur((rng.rand(h, w).astype(np.float32) * 2 - 1), (0, 0), sigma) * alpha * 4
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    return cv2.remap(img, xx + dx, yy + dy, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_REFLECT)


def pixelate(img, severity, rng=None):
    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(1, int(w * c)), max(1, int(h * c))),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def jpeg_compression(img, severity, rng=None):
    q = [25, 18, 15, 10, 7][severity - 1]
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)


def saturate(img, severity, rng=None):
    sat, shift = [(0.3, 0.0), (0.1, 0.0), (2.0, 0.0),
                  (5.0, 0.1), (20.0, 0.2)][severity - 1]
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * sat + shift * 255, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def spatter(img, severity, rng):
    amount = [0.06, 0.09, 0.12, 0.16, 0.2][severity - 1]
    h, w = img.shape[:2]
    drops = (rng.rand(h, w) < amount).astype(np.float32)
    drops = cv2.GaussianBlur(drops, (0, 0), 2.0)
    drops = np.clip(drops * 3.0, 0, 1)[..., None]
    mud = np.array([63, 42, 20], np.float32) / 255.0  # BGR brown
    x = _as_float(img)
    return _to_uint8(x * (1 - drops) + mud * drops)


# the reference's corruption sets (test_robustness.py:216-247)
BENCHMARK_CORRUPTIONS = (
    "gaussian_noise", "shot_noise", "impulse_noise",
    "defocus_blur", "glass_blur", "motion_blur", "zoom_blur",
    "snow", "frost", "fog", "brightness",
    "contrast", "elastic_transform", "pixelate", "jpeg_compression",
)
HOLDOUT_CORRUPTIONS = ("speckle_noise", "gaussian_blur", "spatter", "saturate")
CORRUPTION_SETS = {
    "benchmark": BENCHMARK_CORRUPTIONS,
    "all": BENCHMARK_CORRUPTIONS + HOLDOUT_CORRUPTIONS,
    "noise": ("gaussian_noise", "shot_noise", "impulse_noise"),
    "blur": ("defocus_blur", "glass_blur", "motion_blur", "zoom_blur"),
    "weather": ("snow", "frost", "fog", "brightness"),
    "digital": ("contrast", "elastic_transform", "pixelate", "jpeg_compression"),
    "holdout": HOLDOUT_CORRUPTIONS,
}

_REGISTRY = {name: globals()[name]
             for name in BENCHMARK_CORRUPTIONS + HOLDOUT_CORRUPTIONS}


def corrupt(img: np.ndarray, name: str, severity: int,
            rng: np.random.RandomState) -> np.ndarray:
    """Apply corruption `name` at `severity` (1-5; 0 = identity)."""
    if severity == 0 or name == "None":
        return img
    assert 1 <= severity <= 5, severity
    out = _REGISTRY[name](img, severity, rng)
    assert out.shape == img.shape and out.dtype == np.uint8
    return out

"""Synthetic Goodreads-layout dataset for tests and CLI drives."""
from __future__ import annotations

import os

import numpy as np


def build_fake_dataset(root: str, n_train: int = 8, n_test: int = 4,
                       img_size: int = 32, with_source: bool = False) -> str:
    """Create df_train.csv/df_test.csv + images/images/<id>.jpg under root."""
    import pandas as pd
    from PIL import Image

    img_dir = os.path.join(root, "images", "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)

    n = n_train + n_test
    rows = []
    for i in range(n):
        rows.append({
            "book_authors": f"Author {i}",
            "book_title": f"Title {i}",
            "book_desc": f"A plain english description number {i}.",
        })
        arr = rng.randint(0, 255, (img_size, img_size, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.jpg"))
    df = pd.DataFrame(rows)
    df.iloc[:n_train].to_csv(os.path.join(root, "df_train.csv"))
    # test split keeps global ids (reference: last rows of the full csv)
    test = df.iloc[n_train:]
    test.to_csv(os.path.join(root, "df_test.csv"))
    if with_source:
        src = df.copy()
        src.loc[n] = {"book_authors": "Автор", "book_title": "Книга",
                      "book_desc": "Описание полностью на русском языке"}
        arr = rng.randint(0, 255, (img_size, img_size, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{n}.jpg"))
        src.to_csv(os.path.join(root, "book_data.csv"))
    return root


def _cover_image(idx: int, img_size: int) -> "np.ndarray":
    """One procedurally structured book cover (deterministic per idx).

    Unlike the uniform-noise covers of build_fake_dataset (fine for
    integration smoke), these have learnable structure — a two-tone
    background, a frame, a title band, an author strip and a motif shape —
    so a model trained on them acquires a distribution against which FID
    responds to sampler quality (used by experiments/r5_fid4000.py).
    """
    rng = np.random.RandomState(idx * 9973 + 17)
    s = img_size
    palette = np.array([
        [174, 32, 18], [22, 82, 144], [24, 110, 54], [120, 48, 132],
        [196, 128, 22], [40, 40, 46], [0, 128, 128], [128, 24, 64],
    ], dtype=np.float32)
    top = palette[idx % len(palette)]
    bot = palette[(idx // len(palette) + 3) % len(palette)]
    t = np.linspace(0.0, 1.0, s, dtype=np.float32)[:, None, None]
    img = np.zeros((s, s, 3), np.float32)
    img += top[None, None, :] * (1 - t) + bot[None, None, :] * t
    # vertical texture stripes (low contrast)
    phase = rng.uniform(0, 2 * np.pi)
    stripes = 12.0 * np.sin(np.arange(s, dtype=np.float32) / s
                            * (6 + idx % 5) * 2 * np.pi + phase)
    img += stripes[None, :, None]
    # frame
    m = max(2, s // 24)
    img[m:m + m // 2 + 1, m:-m] = 235.0
    img[-(m + m // 2 + 1):-m, m:-m] = 235.0
    img[m:-m, m:m + m // 2 + 1] = 235.0
    img[m:-m, -(m + m // 2 + 1):-m] = 235.0
    # title band (upper third) + author strip (lower)
    y0, y1 = int(0.18 * s), int(0.34 * s)
    img[y0:y1, int(0.12 * s):int(0.88 * s)] = 240.0
    for k in range(2 + idx % 3):  # "text" lines in the band
        ty = y0 + int((k + 1) * (y1 - y0) / (3 + idx % 3))
        img[ty:ty + max(1, s // 128 + 1),
            int(0.16 * s):int(0.84 * s)] = 40.0
    a0, a1 = int(0.78 * s), int(0.86 * s)
    img[a0:a1, int(0.25 * s):int(0.75 * s)] = 25.0
    # motif: filled disc of varying radius/position
    cy = int(s * (0.5 + 0.08 * np.sin(idx)))
    cx = int(s * (0.5 + 0.08 * np.cos(idx * 1.7)))
    r = s * (0.08 + 0.05 * ((idx % 7) / 6.0))
    yy, xx = np.mgrid[0:s, 0:s]
    disc = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    img[disc] = palette[(idx + 5) % len(palette)]
    return np.uint8(np.clip(img, 0, 255))


def build_cover_dataset(root: str, n_train: int = 64, n_test: int = 16,
                        img_size: int = 512) -> str:
    """df_train/df_test + structured cover JPEGs (see _cover_image)."""
    import pandas as pd
    from PIL import Image

    img_dir = os.path.join(root, "images", "images")
    os.makedirs(img_dir, exist_ok=True)
    n = n_train + n_test
    rows = []
    for i in range(n):
        rows.append({
            "book_authors": f"Author {i}",
            "book_title": f"Title {i}",
            "book_desc": f"A structured english cover description {i}.",
        })
        Image.fromarray(_cover_image(i, img_size)).save(
            os.path.join(img_dir, f"{i}.jpg"), quality=92)
    df = pd.DataFrame(rows)
    df.iloc[:n_train].to_csv(os.path.join(root, "df_train.csv"))
    df.iloc[n_train:].to_csv(os.path.join(root, "df_test.csv"))
    return root

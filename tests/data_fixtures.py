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

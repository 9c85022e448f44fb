"""Prompt template bank — single source of truth.

The reference keeps two drifted copies of its template lists (utils.py:14-64
and inference.py:101-150, noted in SURVEY.md C7).  This module is the single
bank for both training and evaluation.  Wording is original to this framework;
the *roles* mirror the reference: training templates interpolate
``{author}``/``{title}`` (optionally followed by the book description), summary
placeholders interpolate a DistilBART-style summary, and test templates are
fixed qualitative-eval prompts rendered with fixed latents.

The "legible text" trigger phrase appended with probability
``legible_text_prob`` during training (utils.py:155-160) is exported as
LEGIBLE_SUFFIX.
"""
from __future__ import annotations

import random
from typing import List, Optional, Sequence

# Appended w.p. legible_text_prob during training so the model learns an
# explicit "readable title text" conditioning handle.
LEGIBLE_SUFFIX = ", with clear legible title text"

# -- training-time templates (interpolate author/title of the sampled row) --
TRAINING_TEMPLATES: List[str] = [
    "a book cover for “{title}” by {author}",
    "front cover of the book {title}, written by {author}",
    "cover art for {author}'s book {title}",
    "the jacket design of “{title}” ({author})",
    "publishing cover artwork: {title} by {author}",
]

# -- placeholders that interpolate a model-generated plot summary ------------
SUMMARY_PLACEHOLDERS: List[str] = [
    "a book cover about {summary}",
    "cover art depicting {summary}",
    "a novel jacket illustrating {summary}",
    "book cover artwork themed around {summary}",
    "an illustrated cover showing {summary}",
    "cover design inspired by {summary}",
    "a paperback cover about {summary}",
    "a hardcover jacket portraying {summary}",
    "front cover imagery of {summary}",
    "a cover painting of {summary}",
]

# -- fixed qualitative-eval prompts (the visualize_prompts grid rows) --------
TEST_TEMPLATES: List[str] = [
    "a mystery novel cover with a foggy street at night",
    "a romance book cover with two silhouettes at sunset",
    "a science fiction book cover with a ringed planet",
    "a fantasy novel cover with a dragon over mountains",
    "a thriller book cover with a lone figure on a bridge",
    "a historical novel cover with an old sailing ship",
    "a horror book cover with an abandoned house",
    "a children's book cover with a friendly fox",
    "a poetry collection cover with watercolor flowers",
    "a biography cover with a vintage portrait",
    "a travel memoir cover with a winding coastal road",
    "a cookbook cover with rustic ingredients on a table",
    "a self-help book cover with a sunrise over hills",
]


def format_training_prompt(author: str, title: str,
                           desc: Optional[str] = None,
                           rng: Optional[random.Random] = None,
                           legible_text_prob: float = 0.0) -> str:
    """Random training template → prompt (reference utils.py:147-163 behavior)."""
    rng = rng or random
    prompt = rng.choice(TRAINING_TEMPLATES).format(author=author, title=title)
    if rng.random() < legible_text_prob:
        prompt += LEGIBLE_SUFFIX
    if desc:
        prompt = f"{prompt}. {desc}"
    return prompt


def padded_placeholders(n: int, rng: Optional[random.Random] = None) -> List[str]:
    """Summary placeholders padded by random choice to length n (utils.py:60-64)."""
    rng = rng or random
    out = list(SUMMARY_PLACEHOLDERS)
    while len(out) < n:
        out.append(rng.choice(SUMMARY_PLACEHOLDERS))
    return out[:n]

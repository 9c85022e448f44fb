"""Reference-exact prompt bank: byte-match tests.

Expected strings below are hardcoded renderings of the reference's
``template.format(legible_text, author, title[, description])`` calls
(utils.py:133-146, inference.py:165-172,299-330) so a drift in the copied
template data or in the positional-slot semantics fails loudly.
"""
import random

from sdbc_tpu.data import templates as T


def test_training_template_first_slot_legible():
    out = T.render_reference_prompt(T.REFERENCE_TRAINING_TEMPLATES[0], True,
                                    "Jane Doe", "The Sea")
    assert out == "A legible text book cover with author Jane Doe, book title The Sea "


def test_training_template_empty_legible_double_space():
    out = T.render_reference_prompt(T.REFERENCE_TRAINING_TEMPLATES[0], False,
                                    "Jane Doe", "The Sea")
    assert out == "A  book cover with author Jane Doe, book title The Sea "


def test_include_desc_zip_concatenation():
    # utils.py:111-113: templates[i] + summary_placeholders[i], 4 positionals
    out = T.render_reference_prompt(
        T.REFERENCE_TRAINING_TEMPLATES[2], False, "A. B.", "T",
        desc="a story", placeholder=T.REFERENCE_SUMMARY_PLACEHOLDERS[2])
    assert out == "A   book cover with author name:A. B., book title: T,summary: a story"


def test_inference_placeholder_brace_bug_repaired():
    # the reference's verbatim ",summary {}}" placeholder makes .format()
    # RAISE (its include_desc grid path crashes at template index 1); the
    # bank carries the repaired well-formed slot instead, documented
    import pytest

    with pytest.raises(ValueError, match="Single '}'"):
        ("x" + ",summary {}}").format("", "A", "T", "D")
    out = T.render_reference_prompt(
        T.REFERENCE_INFERENCE_TEST_TEMPLATES[1], False, "A", "T",
        desc="D", placeholder=T.REFERENCE_INFERENCE_SUMMARY_PLACEHOLDERS[1])
    assert out == "A  book cover written by author: A with book title: T ,summary D"


def test_inference_two_slot_cartoon_quirk():
    # last inference test template has only two slots: format() binds
    # legible→author-name and author→title, silently dropping title —
    # positional formatting reproduces the reference's behavior byte-exactly
    out = T.render_reference_prompt(
        T.REFERENCE_INFERENCE_TEST_TEMPLATES[-1], True, "Auth", "Title")
    assert out == ("A cartoon-styled, entertaining book cover with author "
                   "name: legible text, book title: Auth")


def test_training_draw_order_matches_reference():
    """utils.py:133-142 draws legible (random() <= prob) BEFORE the template
    choice; the bank function must consume the rng in the same order."""
    for seed in (0, 1, 7):
        r1, r2 = random.Random(seed), random.Random(seed)
        got = T.format_reference_training_prompt("A", "T", rng=r1,
                                                 legible_text_prob=0.5)
        legible = "legible text" if r2.random() <= 0.5 else ""
        want = r2.choice(T.REFERENCE_TRAINING_TEMPLATES).format(legible,
                                                                "A", "T")
        assert got == want


def test_fid_prompt_uses_inference_bank_empty_legible():
    r1, r2 = random.Random(3), random.Random(3)
    got = T.reference_fid_prompt("Auth", "Ti", rng=r1)
    want = r2.choice(T.REFERENCE_INFERENCE_TRAINING_TEMPLATES).format(
        "", "Auth", "Ti")
    assert got == want


def test_grid_prompts_shape_and_content():
    rows = [("A1", "T1"), ("A2", "T2")]
    prompts = T.reference_grid_prompts(rows, 2, rng=random.Random(0))
    assert len(prompts) == 2 * len(T.REFERENCE_INFERENCE_TEST_TEMPLATES)
    assert prompts[0] == "A  book cover with author: A1, book title: T1 "
    assert prompts[1] == "A  book cover with author: A2, book title: T2 "


def test_dataset_prompt_bank_wiring(tmp_path):
    from tests.data_fixtures import build_fake_dataset
    from sdbc_tpu.data.dataset import DatasetConfig, GoodreadsDataset
    from sdbc_tpu.data.tokenizer import CLIPTokenizer

    root = build_fake_dataset(str(tmp_path), n_train=2, n_test=1, img_size=16)
    cfg = DatasetConfig(data_root=root, img_size=16, max_length=16,
                        prompt_bank="reference", legible_text_prob=0.5)
    ds = GoodreadsDataset(cfg, CLIPTokenizer.fallback(512))
    got = ds.prompt_for(0, rng=random.Random(11))
    want = T.format_reference_training_prompt(
        "Author 0", "Title 0", rng=random.Random(11), legible_text_prob=0.5)
    assert got == want

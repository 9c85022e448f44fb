"""pt-inception-2015 port exercised end-to-end on a synthesized state dict.

The real pt_inception-2015-12-05-*.pth cannot be downloaded here (zero
egress); this test keeps the port honest (round-1 VERDICT item 6) by
synthesizing a state dict with the EXACT pytorch-fid key schema/shapes,
running it through load_fid_inception (both the .pth/torch and .npz paths),
and asserting tree shapes and forward-pass equality against the framework's
own tree (gamma=1 makes the pt-style BN numerically identical to the 2015
graph's beta-only BN).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdbc_tpu.models import inception, port


def _discover_key_map():
    """pt-key ↔ unit-path map, discovered by feeding a recording dict through
    port_fid_inception itself (no duplicated mapping in the test)."""
    seen = {}

    class Recorder(dict):
        def __getitem__(self, key):
            seen[len(seen) + 1.0] = key
            if key.endswith(".conv.weight"):
                return np.full((1, 1, 1, 1), len(seen), np.float32)
            return np.full((1,), len(seen), np.float32)

    marked = port.port_fid_inception(Recorder())
    return marked, seen


def _synthesize_state_dict(ref):
    """Flat pt-schema dict carrying ref's weights (gamma := 1)."""
    marked, seen = _discover_key_map()
    flat = {}

    def walk(m_node, r_node):
        if isinstance(m_node, dict) and "w" in m_node:
            # one BasicConv2d unit; recover the pt block name from the marker
            name = seen[float(np.asarray(m_node["w"]).flat[0])]
            name = name[: -len(".conv.weight")]
            w = np.asarray(r_node["w"], np.float32)      # HWIO
            cout = w.shape[-1]
            flat[f"{name}.conv.weight"] = np.transpose(w, (3, 2, 0, 1))
            flat[f"{name}.bn.weight"] = np.ones((cout,), np.float32)
            flat[f"{name}.bn.bias"] = np.asarray(r_node["beta"], np.float32)
            flat[f"{name}.bn.running_mean"] = np.asarray(r_node["mean"],
                                                         np.float32)
            flat[f"{name}.bn.running_var"] = np.asarray(r_node["var"],
                                                        np.float32)
            return
        if isinstance(m_node, dict):
            for k in m_node:
                walk(m_node[k], r_node[k])
        elif isinstance(m_node, list):
            for a, b in zip(m_node, r_node):
                walk(a, b)

    walk(marked, ref)
    return flat


@pytest.fixture(scope="module")
def ref_tree():
    return inception.init(jax.random.key(3), inception.InceptionConfig.fid())


def test_port_tree_shapes_match_init(ref_tree, tmp_path):
    flat = _synthesize_state_dict(ref_tree)
    # pytorch-fid schema sanity: canonical keys present
    assert "Conv2d_1a_3x3.conv.weight" in flat
    assert "Mixed_7c.branch_pool.bn.running_var" in flat
    assert flat["Conv2d_1a_3x3.conv.weight"].shape == (32, 3, 3, 3)

    np.savez(tmp_path / "pt.npz", **flat)
    loaded = port.load_fid_inception(str(tmp_path / "pt.npz"))

    # every non-gamma leaf must land in the right slot with the right shape
    def compare(a, b):
        if isinstance(a, dict):
            assert set(a) - {"gamma"} == set(b) - {"gamma"}
            for k in b:
                if k != "gamma":
                    compare(a[k], b[k])
        elif isinstance(a, list):
            assert len(a) == len(b)
            for x, y in zip(a, b):
                compare(x, y)
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    compare(loaded, ref_tree)


def test_ported_forward_matches_and_torch_path(ref_tree, tmp_path):
    flat = _synthesize_state_dict(ref_tree)
    import torch

    # np.copy: torch.from_numpy on a non-writable array warns
    torch.save({k: torch.from_numpy(np.copy(v)) for k, v in flat.items()},
               tmp_path / "pt_inception-2015-12-05-test.pth")
    loaded = port.load_fid_inception(
        str(tmp_path / "pt_inception-2015-12-05-test.pth"))

    cfg = inception.InceptionConfig.fid()
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (1, 75, 75, 3)).astype(np.float32))
    f_ref = np.asarray(inception.features(ref_tree, x, cfg))
    f_port = np.asarray(inception.features(loaded, x, cfg))
    assert f_ref.shape == (1, 2048)
    np.testing.assert_allclose(f_port, f_ref, rtol=1e-5, atol=1e-5)

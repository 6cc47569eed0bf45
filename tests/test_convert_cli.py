"""convert CLI: torch .pt -> orbax -> torch round-trip on a tiny model."""

import numpy as np
import pytest

import jax

from sprc_tpu.loader import init_params

from test_variants import IMG, build

torch = pytest.importorskip("torch")


def test_convert_roundtrip(tmp_path, monkeypatch):
    import sprc_tpu.cli.convert as cv
    from sprc_tpu.interop.torch_export import params_to_torch_state_dict
    from sprc_tpu.train.checkpoint import restore_params

    model = build("blip2_cir_align_prompt")
    params = init_params(model, image_size=IMG)
    import sprc_tpu.loader as loader_mod

    monkeypatch.setattr(loader_mod, "build_model", lambda *a, **kw: model)

    # a reference-style checkpoint: {ClassName: state_dict} (utils.py:219-222)
    sd = params_to_torch_state_dict(params, model)
    pt = tmp_path / "ref.pt"
    torch.save(
        {model.__class__.__name__: {
            k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in sd.items()
        }},
        pt,
    )

    orbax_dir = tmp_path / "orbax_params"
    cv.main(["--input", str(pt), "--output", str(orbax_dir)])
    restored = restore_params(str(orbax_dir))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(restored)[0],
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-6, err_msg=jax.tree_util.keystr(pa),
        )

    # back out to torch: tensors match the original export exactly
    out_pt = tmp_path / "back.pt"
    cv.main(["--input", str(orbax_dir), "--output", str(out_pt)])
    back = torch.load(out_pt, weights_only=True)[model.__class__.__name__]
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(
            back[k].numpy(), np.asarray(sd[k], np.float32), atol=1e-6, err_msg=k
        )

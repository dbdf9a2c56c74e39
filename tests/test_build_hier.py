"""Offline bank-prep CLI (`python -m range_tpu.build_hier`): the cache it
writes must hit at serving time (identical build signature), so cold starts
never pay the k-means/packing build (VERDICT r3 #6)."""

import pytest

import range_tpu
from range_tpu.build_hier import build_kwargs_from_profile, main


def test_profile_build_kwargs_drop_serving_only_keys():
    kw = build_kwargs_from_profile("flagship")
    assert kw["lr_rank"] == 256 and kw["res_rank"] == 128
    assert kw["gsz_sem"] == 16 and kw["topk_gsz"] == 8
    # serving-only knobs never reach build_hier_bank
    assert "k_tiles" not in kw and "tower_matmul" not in kw

    with pytest.raises(SystemExit, match="nothing to prebuild"):
        build_kwargs_from_profile("exact")
    with pytest.raises(SystemExit, match="unknown profile"):
        build_kwargs_from_profile("nope")


def test_cli_cache_hits_at_serving_time(tmp_path, monkeypatch, capsys):
    """CLI-built cache loads in load_model without any rebuild, and a
    repeat CLI run is a signature-matched no-op."""
    out = str(tmp_path / "hier_cache.npz")
    argv = ["synthetic:2048", "--out", out, "--profile", "flagship",
            "--bn", "128", "--gsz-geo", "16"]
    main(argv)
    assert "built + saved" in capsys.readouterr().out

    # second run: up-to-date detection, no rebuild
    main(argv)
    assert "already up to date" in capsys.readouterr().out

    # serving with the matching profile + overrides must come purely from
    # the cache: a rebuild attempt would call build_hier_bank and explode
    import range_tpu.ops.retrieval_hier as rh

    def boom(*a, **k):
        raise AssertionError("cache miss: serving re-ran build_hier_bank")

    monkeypatch.setattr(rh, "build_hier_bank", boom)
    enc = range_tpu.load_model("RANGE+", db_path="synthetic:2048",
                               profile="flagship", hier_bn=128, gsz_geo=16,
                               hier_cache=out)
    import numpy as np

    coords = np.stack([np.linspace(-170, 170, 64),
                       np.linspace(-80, 80, 64)], axis=1).astype(np.float32)
    out_emb = enc(coords)
    assert out_emb.shape == (64, enc.embedding_dim)


def test_cli_stale_cache_rebuilds(tmp_path):
    """Changing any build param makes the stored signature mismatch and
    the CLI rebuilds rather than serving the stale archive."""
    out = str(tmp_path / "hc.npz")
    base = ["synthetic:1024", "--out", out, "--profile", "flagship",
            "--bn", "128", "--gsz-geo", "16"]
    main(base)
    from range_tpu.ops.retrieval_hier import peek_hier_build

    sig1 = peek_hier_build(out)
    main(base + ["--lr-rank", "8"])  # param change -> rebuild
    sig2 = peek_hier_build(out)
    assert sig1 != sig2 and sig2["lr_rank"] == 8

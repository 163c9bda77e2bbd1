"""JobSpec validation + round-trip (specificationTests analog)."""

from __future__ import annotations

import pytest

from pyreshaper_ray.pipelines.spec import JobSpec, create_spec


def test_defaults_and_roundtrip(tmp_path):
    spec = create_spec(input=str(tmp_path), out_dir=str(tmp_path / "out"))
    assert spec.tiers == ("1m", "1h", "1d")
    assert spec.wmode == "s" and spec.once and spec.gapfill and spec.encode
    p = str(tmp_path / "spec.json")
    spec.write(p)
    again = JobSpec.read(p)
    assert again == spec


def test_type_and_value_validation(tmp_path):
    ok = dict(input=str(tmp_path), out_dir=str(tmp_path / "o"))
    with pytest.raises(TypeError):
        create_spec(**{**ok, "input": 42})
    with pytest.raises(ValueError):
        create_spec(**{**ok, "out_dir": ""})
    with pytest.raises(ValueError):
        create_spec(**{**ok, "n_buckets": -1})  # 0 is valid (= auto-size)
    with pytest.raises(ValueError):
        create_spec(**{**ok, "tiers": ("1m", "bogus")})
    with pytest.raises(ValueError):
        create_spec(**{**ok, "tiers": ("1h", "1m")})  # must be fine→coarse
    with pytest.raises(ValueError):
        create_spec(**{**ok, "wmode": "x"})
    with pytest.raises(ValueError):
        create_spec(**{**ok, "output_limit": 0})
    with pytest.raises(ValueError):
        create_spec(**{**ok, "input": "/nonexistent/deep/path"})

"""Options must either change behavior or warn — never silently no-op
(round-1 review finding; `options.py:_FIXED_BY_DESIGN`)."""

import warnings

import numpy as np
import jax
import pytest

from vbmc_tpu.options import VBMCOptions, _FIXED_BY_DESIGN


def test_fixed_by_design_option_warns():
    with pytest.warns(UserWarning, match="fixed by design"):
        VBMCOptions(gp_hyp_sampler="covsample").resolve(2)


def test_default_options_do_not_warn():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        VBMCOptions().resolve(3)


def test_fixed_list_entries_are_real_fields():
    import dataclasses
    names = {f.name for f in dataclasses.fields(VBMCOptions)}
    assert set(_FIXED_BY_DESIGN) <= names


def test_every_option_is_consumed_or_declared_fixed():
    """No silent no-ops: every VBMCOptions field is read somewhere outside
    options.py, or is in the declared fixed-by-design list."""
    import dataclasses, pathlib, re
    root = pathlib.Path(__file__).resolve().parents[1]
    blob = "\n".join(
        p.read_text() for p in (root / "vbmc_tpu").rglob("*.py")
        if p.name != "options.py")
    blob += (root / "bench.py").read_text()
    silent = []
    for f in dataclasses.fields(VBMCOptions):
        n = f.name
        if n in _FIXED_BY_DESIGN:
            continue
        if re.search(rf"\.{n}\b|\"{n}\"|'{n}'", blob) is None:
            silent.append(n)
    assert not silent, f"options with no reads and not declared fixed: {silent}"


def test_init_design_narrow():
    from vbmc_tpu.active_sample import initial_design
    from vbmc_tpu.function_logger import FunctionLogger
    from vbmc_tpu.transforms import create_trinfo

    D = 2
    ti = create_trinfo(np.full(D, -np.inf), np.full(D, np.inf))
    calls = []

    def fun(x):
        calls.append(np.asarray(x))
        return float(-0.5 * np.sum(x ** 2))

    logger = FunctionLogger(fun, D, ti)
    plb, pub = np.full(D, -3.0), np.full(D, 3.0)
    x0 = np.array([[1.0, 1.0]])
    initial_design(jax.random.PRNGKey(0), logger, 10, plb, pub,
                   x0_cache=x0, init_design="narrow")
    pts = np.stack(calls)
    # All random points inside the 0.1x plausible window around x0.
    assert np.all(np.abs(pts[1:] - x0[0]) <= 0.05 * (pub - plb) + 1e-12)
    with pytest.raises(ValueError, match="initial design"):
        initial_design(jax.random.PRNGKey(0), logger, 20, plb, pub,
                       x0_cache=x0, init_design="bogus")

"""Import helpers for running the REFERENCE code (/root/reference,
read-only) side-by-side with ours in parity tests.

The reference's stage-2 modules need `sonnet` (not installed) plus a few
optional deps (`tensorflow_probability`, `mcubes`, `icecream`). This
module installs minimal faithful stand-ins in sys.modules BEFORE the
reference imports run:

  * sonnet.src.moving_averages.ExponentialMovingAverage — re-implemented
    exactly per sonnet v2 (zero-debiased: hidden EMA divided by
    1 - decay**counter). The VQ parity test depends on this formula; it
    is the published Sonnet semantics the reference trained with.
  * tfp.math.clip_by_value_preserve_gradient — clip forward, identity
    gradient (implemented via stop_gradient, exact).
  * mcubes/icecream — never exercised by the tests; stubs raise/no-op.

Nothing here touches /root/reference; modules are imported from disk.
"""

import sys
import types as _types

REF_DECOMP = "/root/reference/decomp/nerfvq_nfr3"
REF_GEO = "/root/reference/geo/NeuS-ours2"


def _install_sonnet():
    if "sonnet" in sys.modules:
        return
    import numpy as np
    import tensorflow as tf

    class Module(tf.Module):
        """sonnet Modules are tf.Modules: checkpoint auto-tracking of the
        EMA variables (net/vq_layer/ema_*/...) depends on this, matching
        the reference's checkpoint key layout."""

        def __init__(self, name=None):
            super().__init__(name=None)

    class ExponentialMovingAverage(tf.Module):
        """sonnet/src/moving_averages.py semantics (v2, zero-debiased)."""

        def __init__(self, decay, name=None):
            super().__init__(name=None)
            self._decay = decay
            self._counter = tf.Variable(
                0, trainable=False, dtype=tf.int64, name="counter")
            self._hidden = None
            self.average = None

        def initialize(self, value):
            value = tf.convert_to_tensor(value)
            self._hidden = tf.Variable(
                tf.zeros_like(value), trainable=False, name="hidden")
            self.average = tf.Variable(
                tf.zeros_like(value), trainable=False, name="average")

        def update(self, value):
            self._counter.assign_add(1)
            value = tf.convert_to_tensor(value)
            counter = tf.cast(self._counter, value.dtype)
            self._hidden.assign_sub(
                (self._hidden - value) * (1.0 - self._decay))
            self.average.assign(
                self._hidden / (1.0 - tf.pow(self._decay, counter)))

        @property
        def value(self):
            return self.average.read_value()

        def __call__(self, value):
            self.update(value)
            return self.value

    class _AnyAttr(_types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):  # keep import machinery honest
                raise AttributeError(name)
            return object

    sonnet = _types.ModuleType("sonnet")
    src = _types.ModuleType("sonnet.src")
    base = _types.ModuleType("sonnet.src.base")
    base.Module = Module
    ma = _types.ModuleType("sonnet.src.moving_averages")
    ma.ExponentialMovingAverage = ExponentialMovingAverage
    initializers = _AnyAttr("sonnet.src.initializers")
    types_mod = _AnyAttr("sonnet.src.types")
    types_mod.FloatLike = float
    src.base, src.moving_averages = base, ma
    src.initializers, src.types = initializers, types_mod
    sonnet.src = src
    for name, mod in [("sonnet", sonnet), ("sonnet.src", src),
                      ("sonnet.src.base", base),
                      ("sonnet.src.moving_averages", ma),
                      ("sonnet.src.initializers", initializers),
                      ("sonnet.src.types", types_mod)]:
        sys.modules[name] = mod


def _install_tfp():
    if "tensorflow_probability" in sys.modules:
        return
    import tensorflow as tf

    def clip_by_value_preserve_gradient(x, lo, hi):
        return x + tf.stop_gradient(tf.clip_by_value(x, lo, hi) - x)

    tfp = _types.ModuleType("tensorflow_probability")
    math_mod = _types.ModuleType("tensorflow_probability.math")
    math_mod.clip_by_value_preserve_gradient = clip_by_value_preserve_gradient
    tfp.math = math_mod
    sys.modules["tensorflow_probability"] = tfp
    sys.modules["tensorflow_probability.math"] = math_mod


def _install_misc():
    if "mcubes" not in sys.modules:
        mc = _types.ModuleType("mcubes")

        def marching_cubes(*a, **k):
            raise RuntimeError("mcubes stub: not exercised in parity tests")

        mc.marching_cubes = marching_cubes
        sys.modules["mcubes"] = mc
    if "icecream" not in sys.modules:
        ic_mod = _types.ModuleType("icecream")
        ic_mod.ic = lambda *a, **k: a[0] if len(a) == 1 else a
        sys.modules["icecream"] = ic_mod


def import_ref_decomp(module):
    """Import `nerfactor.<module>` from the reference tree."""
    _install_sonnet()
    _install_tfp()
    for p in (REF_DECOMP, f"{REF_DECOMP}/nerfactor"):
        # the reference runs with PYTHONPATH including nerfactor/ itself
        # (trainvali_run.sh:30-36) — `from util import ...` resolves there
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib
    return importlib.import_module(f"nerfactor.{module}")


def import_ref_geo(module):
    """Import `models.<module>` from the reference NeuS tree.

    `models` must resolve to NeuS-ours2/models, not nerfactor/models
    (which import_ref_decomp also puts on sys.path): pin REF_GEO to the
    front and evict any `models` package cached from the wrong tree."""
    _install_misc()
    if REF_GEO not in sys.path:
        sys.path.insert(0, REF_GEO)
    cached = sys.modules.get("models")
    if cached is None or REF_GEO not in str(
            getattr(cached, "__path__", "")):
        for k in [k for k in sys.modules
                  if k == "models" or k.startswith("models.")]:
            del sys.modules[k]
        # NeuS-ours2/models has no __init__.py, so a regular `models`
        # package elsewhere on sys.path (nerfactor/models) would always
        # win; register the package pinned to the NeuS tree explicitly.
        import os
        pkg = _types.ModuleType("models")
        pkg.__path__ = [os.path.join(REF_GEO, "models")]
        pkg.__package__ = "models"
        sys.modules["models"] = pkg
    import importlib
    return importlib.import_module(f"models.{module}")

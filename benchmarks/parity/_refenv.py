"""Import environment for driving the actual reference implementation
(/root/reference, PyTorch CPU) for head-to-head parity runs.

The reference imports torchvision/pytz at module level but the parity
workloads never touch them (synthetic tensors in, models defined
locally in usps_data.py / forest_data.py); this installs minimal inert
stubs so ``import opt`` succeeds, then puts /root/reference on the
path.  NO reference code is copied — it is imported and executed as-is.
"""

import sys
import types

REFERENCE = "/root/reference"


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install():
    if REFERENCE in sys.path:
        return
    import matplotlib

    matplotlib.use("Agg")

    class _Inert:
        """Fully inert attribute/call sink.  Import-time transform
        pipelines built from the stub become inert objects; the parity
        workloads never execute them (verified numerically — both
        sides train on raw tensors)."""

        def __getattr__(self, k):  # pragma: no cover - inert
            return self

        def __call__(self, *a, **k):  # pragma: no cover - inert
            return self

        def __mro_entries__(self, bases):  # tolerate subclassing
            return (object,)

    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        inert = _Inert()
        def _mod_getattr(k, _i=inert):
            # never intercept dunders: inspect/import machinery probes
            # __file__/__path__ etc. on every module in sys.modules
            if k.startswith("__") and k.endswith("__"):
                raise AttributeError(k)
            return _i

        tv.__path__ = []  # behave like a package for find_spec probes
        for sub in ("transforms", "utils", "models", "datasets"):
            mod = _stub(f"torchvision.{sub}")
            mod.__getattr__ = _mod_getattr
            mod.__path__ = []
            setattr(tv, sub, mod)

    if "pytz" not in sys.modules:
        # pandas probes pytz (__version__, UTC, FixedOffset, tzinfo
        # module) during its C-extension init; give it enough to load
        import datetime as _dt

        def _fixed_offset(minutes):
            return _dt.timezone(_dt.timedelta(minutes=minutes))

        class _BaseTzInfo(_dt.tzinfo):
            pass

        pytz = _stub(
            "pytz",
            timezone=lambda name: _dt.timezone.utc,
            __version__="2024.1",
            UTC=_dt.timezone.utc,
            utc=_dt.timezone.utc,
            FixedOffset=_fixed_offset,
        )
        tzi = _stub("pytz.tzinfo", BaseTzInfo=_BaseTzInfo)
        pytz.tzinfo = tzi

    sys.path.insert(0, REFERENCE)

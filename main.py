"""CLI entry point: ``python main.py <config> [key=value ...]``.

Mirrors the reference main.py (argv dispatch into the config module,
main.py:16-19) with one addition: trailing ``key=value`` overrides are
applied to the options dict (values parsed as python literals), e.g.::

    python main.py forest_best max_iter=5 verbose=True

Config names may be given as ``configs.forest_best`` or just
``forest_best``.
"""

import ast
import importlib
import sys

from optwboundeigenval_tpu.train.driver import run


def main(argv):
    name = argv[1] if len(argv) > 1 else "usps_cnn_mu0_01_K0"
    if not name.startswith("optwboundeigenval_tpu.configs."):
        name = "optwboundeigenval_tpu.configs." + name.removeprefix("configs.")
    mod = importlib.import_module(name)
    options = mod.options()
    for arg in argv[2:]:
        key, _, val = arg.partition("=")
        try:
            options[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            options[key] = val
    return run(options)


if __name__ == "__main__":
    main(sys.argv)

"""Static-health checks standing in for a linter (pyflakes/ruff are not
in the container).

Every module under ``from __future__ import annotations`` keeps its
annotations as strings, so a missing ``typing`` import is invisible until
someone calls ``typing.get_type_hints`` — this test does exactly that for
every public function/class in the package, turning the latent NameError
into a CI failure (caught two real ones: ``pipeline/dedup.py`` and
``testing/promqltest.py`` used ``Optional`` without importing it).
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import typing

import prometheus_spark


def _walk_modules():
    for mi in pkgutil.walk_packages(prometheus_spark.__path__, "prometheus_spark."):
        yield importlib.import_module(mi.name)


def test_all_modules_import():
    mods = list(_walk_modules())
    assert len(mods) > 30  # the package is large; a collapse here = broken walk


def test_annotations_resolve():
    failures = []
    for mod in _walk_modules():
        for name, obj in list(vars(mod).items()):
            if not (inspect.isfunction(obj) or inspect.isclass(obj)):
                continue
            if getattr(obj, "__module__", None) != mod.__name__:
                continue  # re-exports are checked in their home module
            try:
                typing.get_type_hints(obj)
            except Exception as exc:  # NameError = missing import
                failures.append(f"{mod.__name__}.{name}: {exc!r}")
    assert not failures, "\n".join(failures)

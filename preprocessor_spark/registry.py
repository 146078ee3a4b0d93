"""Stage registry with dependency-ordered loading — the plugin system
(reference §2.10: filesystem discovery + dependency graph + topological load
order, app/core/plugin_loader.py:221-536) reduced to its Spark-idiomatic
core: named DataFrame→DataFrame stages, optional dependencies, cycle
detection, deterministic topological order. Entry-point discovery
(setup.py:11-18 style) is supported when the package is installed."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

StageFn = Callable[[DataFrame], DataFrame]


@dataclass
class RegisteredStage:
    name: str
    fn: StageFn
    depends_on: list[str] = field(default_factory=list)


class StageRegistry:
    def __init__(self):
        self._stages: dict[str, RegisteredStage] = {}

    def register(
        self, name: str, fn: StageFn | None = None, depends_on: list[str] | None = None
    ):
        """Register a stage; usable as a decorator."""

        def _wrap(f: StageFn) -> StageFn:
            if name in self._stages:
                raise ValueError(f"stage already registered: {name}")
            # dedupe (order-preserving): a duplicate name in depends_on
            # would inflate the topo-sort in-degree by one per COPY while
            # being decremented once per DISTINCT dependency — the stage
            # never becomes ready and load_order reports a spurious cycle
            deps = list(dict.fromkeys(depends_on or []))
            self._stages[name] = RegisteredStage(name, f, deps)
            return f

        return _wrap(fn) if fn is not None else _wrap

    def get(self, name: str) -> RegisteredStage:
        return self._stages[name]

    def names(self) -> list[str]:
        return sorted(self._stages)

    def load_order(self, wanted: list[str] | None = None) -> list[RegisteredStage]:
        """Deterministic topological order (Kahn, lexicographic tiebreak)
        with cycle detection (reference plugin_loader.py:417-491).

        ``wanted=[]`` is an EMPTY plan (a dynamically filtered stage list
        that ends up empty must not silently expand to every registered
        stage); ``wanted=None`` means all stages."""
        names = set(self._stages) if wanted is None else set(wanted)
        unknown = sorted(n for n in names if n not in self._stages)
        if unknown:
            raise ValueError(
                f"unknown stage(s) requested: {unknown}; "
                f"registered: {self.names()}"
            )
        # include transitive dependencies
        frontier = list(names)
        while frontier:
            n = frontier.pop()
            for d in self._stages[n].depends_on:
                if d not in self._stages:
                    raise ValueError(f"stage {n} depends on unknown stage {d}")
                if d not in names:
                    names.add(d)
                    frontier.append(d)
        indeg = {n: 0 for n in names}
        for n in names:
            for d in self._stages[n].depends_on:
                indeg[n] += 1
        order = []
        ready = sorted(n for n, k in indeg.items() if k == 0)
        while ready:
            n = ready.pop(0)
            order.append(n)
            for m in sorted(names):
                if n in self._stages[m].depends_on:
                    indeg[m] -= 1
                    if indeg[m] == 0:
                        ready.append(m)
            ready.sort()
        if len(order) != len(names):
            cyc = sorted(names - set(order))
            raise ValueError(f"dependency cycle among stages: {cyc}")
        return [self._stages[n] for n in order]

    def discover_entry_points(self, group: str = "preprocessor_spark.stages") -> int:
        """Optional setuptools entry-point discovery (legacy plugin loader
        parity, app/plugin_loader_legacy.py:3-16)."""
        try:
            from importlib.metadata import entry_points
        except ImportError:  # pragma: no cover
            return 0
        count = 0
        for ep in entry_points(group=group):
            if ep.name not in self._stages:
                self.register(ep.name, ep.load())
                count += 1
        return count


REGISTRY = StageRegistry()

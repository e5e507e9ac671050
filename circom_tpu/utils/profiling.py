"""Tracing / profiling / statistics (SURVEY.md §5 aux subsystems).

The reference has only vestigial timing prints
(constraint_simplification.rs:469-479) and a statistics exporter
(dag/src/statistics_porting.rs:25).  Here: per-phase wall-clock timers, a
compilation Log summary (constraint_writers/src/log_writer.rs:1-48
analog), circuit statistics JSON, and a jax.profiler trace context for
the TPU witness path.
"""

import contextlib
import json
import time


class PhaseTimer:
    """Accumulates per-phase wall-clock times; print or export."""

    def __init__(self):
        self.phases = {}
        self.order = []

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self.phases:
                self.order.append(name)
                self.phases[name] = 0.0
            self.phases[name] += dt

    def report(self):
        return {name: round(self.phases[name], 4) for name in self.order}

    def render(self):
        return "\n".join(
            f"  {name:<28s} {self.phases[name]*1e3:9.1f} ms"
            for name in self.order
        )


@contextlib.contextmanager
def device_trace(logdir):
    """jax.profiler trace for the TPU witness program (TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def circuit_statistics(cc):
    """Statistics export (dag/src/statistics_porting.rs analog)."""
    rows = cc.r1cs_rows()
    counts = cc.counts()
    n_linear = sum(1 for (a, b, _c) in rows if not a and not b)
    per_template = {}
    for node in cc.dag.nodes:
        st = per_template.setdefault(node.template_name, {
            "instances": 0, "constraints": 0, "signals": 0,
        })
        st["instances"] += 1
        st["constraints"] += len(node.constraints)
        st["signals"] += len(node.locals)
    return {
        "prime": cc.archive.prime,
        "constraints": len(rows),
        "non_linear_constraints": len(rows) - n_linear,
        "linear_constraints": n_linear,
        "wires": counts["n_wires"],
        "labels": counts["n_labels"],
        "public_outputs": counts["n_pub_out"],
        "public_inputs": counts["n_pub_in"],
        "private_inputs": counts["n_prv_in"],
        "template_instances": len(cc.dag.nodes),
        "per_template": per_template,
    }


def write_statistics(cc, path):
    with open(path, "w") as f:
        json.dump(circuit_statistics(cc), f, indent=1)

"""Compilation pipeline: source -> archive -> DAG -> artifacts -> witness.

Drives the same sequence as the reference CLI (circom/src/main.rs:23-70):
parse -> analyse -> execute (constraints + instances) -> export, plus the
TPU-specific witness paths (host calculator / tape).
"""

import os

from ..frontend.archive import run_parser
from ..frontend import ast as A
from ..field.primes import PRIMES, field_spec
from ..utils.reports import Report, ReportCollection
from ..emit.binfmt import write_r1cs, write_wtns, field_size_bytes
from ..backend.tape import Tape
from .executor import Executor
from .dag import DAG


class CompiledCircuit:
    def __init__(self, archive, dag: DAG, memo, main_node_id):
        self.archive = archive
        self.dag = dag
        self.memo = memo
        self.main_node_id = main_node_id
        self.p = archive.field_p

    # -- constraint artifacts -------------------------------------------
    def r1cs_rows(self):
        """O0 constraint rows with global wire ids (identity witness map)."""
        return [(c.a, c.b, c.c) for c in self.dag.global_constraints()]

    def write_r1cs(self, path):
        n_out, n_pub_in, n_prv_in = self.dag.public_info()
        n_wires = self.dag.total_signals()
        write_r1cs(
            path, self.p,
            [(c.a, c.b, c.c) for c in self.dag.global_constraints()],
            n_wires, n_out, n_pub_in, n_prv_in, n_wires,
        )

    def sym_lines(self):
        """`original,witness,node_id,symbol` lines
        (constraint_writers/src/sym_writer.rs:4-37, O0 mapping)."""
        return [
            f"{gid},{gid},{nid},{name}"
            for (gid, nid, name) in self.dag.sym_entries()
        ]

    def write_sym(self, path):
        with open(path, "w") as f:
            for line in self.sym_lines():
                f.write(line + "\n")

    # -- witness paths ---------------------------------------------------
    def witness_host(self, inputs: dict, sanity_check=2):
        """Reference-semantics host witness calculation -> list of ints
        in witness order ([1, signals…], O0 identity order)."""
        ex = Executor(self.archive, "hostwit", dag=self.dag, memo=self.memo,
                      sanity_check=sanity_check)
        ex.run_witness(inputs)
        return self._assemble(ex.instances_by_path, const_one=1)

    def build_tape(self):
        """Flatten the witness computation to an SSA tape (TPU path).

        Inputs are tape input nodes in main-input declaration order
        (row-major elements).
        """
        tape = Tape(self.p)
        main_node = self.dag.nodes[self.main_node_id]
        inputs = {}
        idx = 0
        for (name, dims, xtype, _tags) in main_node.wire_info:
            if xtype == A.SignalType.INPUT:
                n = 1
                for d in dims:
                    n *= d
                from .values import Slice

                refs = [tape.input(idx + j) for j in range(n)]
                inputs[name] = Slice(dims, refs)
                idx += n
        ex = Executor(self.archive, "tape", tape=tape, dag=self.dag,
                      memo=self.memo)
        ex.run_witness(inputs)
        refs = self._assemble(ex.instances_by_path, const_one=None)
        out_refs = []
        for r in refs:
            if isinstance(r, int):
                out_refs.append(tape.const(r))
            else:
                out_refs.append(r)
        tape.set_outputs(out_refs)
        return tape, self.input_layout()

    def input_layout(self):
        """[(input name, dims, flat offset)] for the main component."""
        main_node = self.dag.nodes[self.main_node_id]
        out = []
        off = 0
        for (name, dims, xtype, _tags) in main_node.wire_info:
            if xtype == A.SignalType.INPUT:
                n = 1
                for d in dims:
                    n *= d
                out.append((name, tuple(dims), off))
                off += n
        return out

    def _assemble(self, instances_by_path, const_one):
        """Collect witness values in O0 global order ([0]=1, then DFS)."""
        values = [const_one if const_one is not None else 1]
        for path, node, offset in self.dag.walk():
            inst = instances_by_path.get(path)
            if inst is None:
                raise Report.error(
                    f"no executed instance for {path}", "T2048")
            for local_id in node.local_signals_sorted():
                wire_name, flat_idx = node.id_to_elem[local_id]
                decl = inst.signals.get(wire_name)
                v = None if decl is None else decl.slice.values[flat_idx]
                if v is None:
                    v = 0  # unassigned signal defaults to 0 (wasm semantics)
                values.append(v)
        return values

    def witness_order_size(self):
        return self.dag.total_signals()


def compile_circuit(path: str, prime: str = "bn128", link_libraries=(),
                    no_init: bool = False) -> CompiledCircuit:
    spec = field_spec(prime)
    archive, warnings = run_parser(
        path, spec.p, prime, link_libraries, no_init)
    ex = Executor(archive, "constrain")
    main_node_id = ex.run_constrain()
    return CompiledCircuit(archive, ex.dag, ex.memo, main_node_id)


def compile_source(source: str, prime: str = "bn128", tmpdir=None,
                   **kw) -> CompiledCircuit:
    """Convenience: compile from a source string (tests)."""
    import tempfile

    d = tmpdir or tempfile.mkdtemp(prefix="circom_tpu_")
    p = os.path.join(d, "main.circom")
    with open(p, "w") as f:
        f.write(source)
    return compile_circuit(p, **kw)

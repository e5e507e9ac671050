"""Standalone batched witness generator: artifact + inputs -> .wtns.

The TPU analog of the reference's per-circuit runtimes — node
generate_witness.js (code_producers/src/wasm_elements/common/
generate_witness.js:1-21) and the compiled C++ main
(c_elements/common/main.cpp:217) — consuming the serialized program
artifact (--tpu output) so witness generation never recompiles the
circuit:

    python -m circom_tpu.witness circuit.tpu.json inputs.json -o out/

inputs.json is one input map or a list of maps (a batch); every
artifact feature rides along: narrow-lane input hints (validated
host-side), while-unroll guards (T3013), extern_c splice recipes, and
the batched R1CS sanity checker (--sanity_check >= 1).
"""

import argparse
import json
import os
import sys

import numpy as np

from .backend.artifacts import load_program
from .backend.jax_backend import WitnessProgram
from .emit.binfmt import write_wtns
from .field.hostfield import HostField
from .field.primes import field_spec
from .utils.reports import Report, ReportCollection


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="circom-tpu-witness",
        description="batched witness generation from a compiled "
                    "circom-tpu program artifact")
    ap.add_argument("artifact", help="<name>.tpu.json from --tpu")
    ap.add_argument("inputs", help="JSON input map or list of maps")
    ap.add_argument("-o", "--output", default=".")
    ap.add_argument("--sanity_check", type=int, default=2,
                    choices=[0, 1, 2, 3])
    args = ap.parse_args(argv)

    # reload must not re-pay the device compile: the reference's
    # compiled circuit starts instantly from .dat/.wasm (main.cpp:22)
    from .utils.cache import enable_persistent_cache

    enable_persistent_cache()

    tape, layout, meta = load_program(args.artifact)
    spec = field_spec(meta["prime"])
    hints = meta["input_range_hints"]
    prog = WitnessProgram(tape, spec, unroll_threshold=0,
                          input_ranges=hints)
    with open(args.inputs) as f:
        batch_inputs = json.load(f)
    if isinstance(batch_inputs, dict):
        batch_inputs = [batch_inputs]

    from .cli import _batch_columns, _check_hinted_columns

    try:
        cols = _batch_columns(spec.p, batch_inputs, layout, prog)
        _check_hinted_columns(cols, hints, spec.p, layout)
        if tape.extern_calls:
            from .backend.tape import compute_extern_columns

            compute_extern_columns(tape, cols, HostField(spec))
    except (Report, ReportCollection) as r:
        print(r.render(None), file=sys.stderr)
        print("previous errors were found", file=sys.stderr)
        return 1

    out = prog.run(prog.encode_inputs(cols))
    n_wit = prog.n_witness - prog.n_guards
    if prog.n_guards:
        g = np.asarray(out[n_wit:])
        if g.any():
            print("error[T3013]: data-dependent while loop exceeded "
                  "the unroll bound for some witness (recompile with "
                  "a larger --while_max_unroll)", file=sys.stderr)
            return 1
        out = out[:n_wit]
    if args.sanity_check >= 1:
        import jax

        from .backend.checker import R1CSChecker

        checker = R1CSChecker(meta["rows"],
                              meta["counts"]["n_wires"], spec)
        ok, first_bad = jax.jit(checker.check_detailed)(out)
        ok = np.asarray(ok)
        if not ok.all():
            first_bad = np.asarray(first_bad)
            for bi in np.flatnonzero(~ok)[:10]:
                print(f"error[T3012]: witness {bi} violates constraint "
                      f"{int(first_bad[bi])} (sanity check failed)",
                      file=sys.stderr)
            return 1
    os.makedirs(args.output, exist_ok=True)
    name = os.path.splitext(
        os.path.basename(args.artifact))[0].removesuffix(".tpu")
    decoded = prog.decode_outputs(out)
    for bi in range(len(batch_inputs)):
        path = os.path.join(args.output, f"{name}.{bi}.wtns")
        write_wtns(path, spec.p,
                   [decoded[i][bi] for i in range(len(decoded))])
    print(f"{len(batch_inputs)} witnesses written to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Tag propagation semantics (assignment_utils.rs perform_tag_propagation,
component_representation.rs handle_tag_assignment_no_init/_init,
mkdocs tags.md).

The reference's rule set, pinned here:
* a direct signal substitution inherits ALL the source's tags, even
  ones the destination never declared (tags.md:38);
* partial array assignments intersect — the array only keeps a tag
  carried by every assignment;
* a user-fixed tag value (`x.tag = v`) is never overwritten by
  propagation;
* at a component-input boundary declared tags are obligations
  (AssignmentMissingTags) and split assignments must agree on the tag
  value (AssignmentTagInputTwice); undeclared extra tags are dropped.
"""

from circom_tpu.compiler.pipeline import compile_source
from test_error_codes import expect, reports_of

P = "pragma circom 2.0.0;\n"

BITIFY = """
template Bitify() {
    signal input in;
    signal output {binary} out;
    out <== in;
    in*(in-1) === 0;
}
"""

CONSUMER = """
template Consumer() {
    signal input {binary} b;
    signal output out;
    out <== b;
}
"""


def test_tags_inherited_through_undeclared_intermediate():
    # tags.md:38-50 — `intermediate` never declares {binary} but
    # inherits it, and the chained signal still satisfies the
    # consumer's obligation.
    src = P + BITIFY + CONSUMER + """
template Main() {
    signal input in;
    signal mid;
    signal mid2;
    component g = Bitify();
    g.in <== in;
    mid <== g.out;
    mid2 <== mid;
    component c = Consumer();
    c.b <== mid2;
    signal output out <== c.out;
}
component main = Main();
"""
    assert reports_of(src) == []


def test_tag_obligation_still_enforced():
    src = P + CONSUMER + """
template Main() {
    signal input in;
    component c = Consumer();
    c.b <== in;
    signal output out <== c.out;
}
component main = Main();
"""
    expect(src, "T2040")


def test_partial_array_assignment_intersects_tags():
    # mid[0] inherits binary, mid[1] comes from arithmetic (no tags):
    # the array as a whole loses the tag, so the consumer errors.
    src = P + BITIFY + """
template Consumer2() {
    signal input {binary} b[2];
    signal output out;
    out <== b[0] + b[1];
}
template Main() {
    signal input in;
    signal mid[2];
    component g = Bitify();
    g.in <== in;
    mid[0] <== g.out;
    mid[1] <== in * in;
    component c = Consumer2();
    c.b[0] <== mid[0];
    c.b[1] <== mid[1];
    signal output out <== c.out;
}
component main = Main();
"""
    expect(src, "T2040")


def test_valued_tag_inherits_and_reads_through_undeclared_signal():
    src = P + """
template Producer(n) {
    signal input in;
    signal output {maxbit} out;
    out.maxbit = n;
    out <== in;
}
template Consumer3() {
    signal input {maxbit} x;
    signal output out;
    out <== x * x.maxbit;
}
template Main() {
    signal input in;
    signal mid;
    component p = Producer(8);
    p.in <== in;
    mid <== p.out;
    component c = Consumer3();
    c.x <== mid;
    signal output out <== c.out;
}
component main = Main();
"""
    assert reports_of(src) == []
    cc = compile_source(src, simplification="O0")
    # Consumer3 saw maxbit=8: out = x*8, witness x=3 -> out=24
    w = cc.witness_host({"in": 3})
    assert w[1] == 24


def test_user_fixed_tag_value_not_overwritten():
    # `out.max = 10` then assigning from a source carrying max=7 keeps
    # the user-fixed 10 (TagState.value_defined wins).
    src = P + """
template Src() {
    signal input in;
    signal output {max} out;
    out.max = 7;
    out <== in;
}
template Main() {
    signal input in;
    component s = Src();
    s.in <== in;
    signal {max} mid;
    mid.max = 10;
    mid <== s.out;
    signal output out <== mid * mid.max;
}
component main = Main();
"""
    assert reports_of(src) == []
    cc = compile_source(src, simplification="O0")
    w = cc.witness_host({"in": 2})
    assert w[1] == 20  # mid.max stayed 10


def test_split_input_assignment_with_different_tag_values_errors():
    # AssignmentTagInputTwice: both halves of a tagged input array must
    # carry the SAME tag value.
    src = P + """
template Producer(n) {
    signal input in;
    signal output {maxbit} out;
    out.maxbit = n;
    out <== in;
}
template Consumer4() {
    signal input {maxbit} x[2];
    signal output out;
    out <== x[0] + x[1];
}
template Main() {
    signal input in;
    component p1 = Producer(8);
    component p2 = Producer(16);
    p1.in <== in;
    p2.in <== in;
    component c = Consumer4();
    c.x[0] <== p1.out;
    c.x[1] <== p2.out;
    signal output out <== c.out;
}
component main = Main();
"""
    expect(src, "T2040")


def test_inherited_tag_flows_out_through_component_output():
    # An output that inherits a tag (undeclared) exports it to callers:
    # Wrapper.out gets {binary} from Bitify.out via substitution, and
    # the outer consumer's obligation is satisfied.
    src = P + BITIFY + CONSUMER + """
template Wrapper() {
    signal input in;
    signal output out;
    component g = Bitify();
    g.in <== in;
    out <== g.out;
}
template Main() {
    signal input in;
    component w = Wrapper();
    w.in <== in;
    component c = Consumer();
    c.b <== w.out;
    signal output out <== c.out;
}
component main = Main();
"""
    assert reports_of(src) == []


def test_partially_assigned_source_drops_inherited_tag():
    """compute_propagated_tags gating (assignment_utils.rs:30-45): an
    element read from a HALF-assigned array must not carry the array's
    inherited {binary} tag — the reference only propagates tags from a
    fully-assigned source (remaining_inserts == 0), so the component
    input obligation below fails with AssignmentMissingTags."""
    src = P + BITIFY + CONSUMER + """
template Main() {
    signal input x;
    signal output out;
    component b = Bitify();
    b.in <== x;
    signal arr[2];
    arr[0] <== b.out;          // arr inherits {binary} from b.out ...
    component c = Consumer();
    c.b <== arr[0];            // ... but arr[1] is still unassigned
    out <== c.out;
    arr[1] <== b.out;
}
component main = Main();
"""
    expect(src, "T2040")


def test_partially_assigned_source_nulls_declared_value():
    """A DECLARED-but-not-user-fixed tag on a half-assigned array is
    still carried (state.defined branch of compute_propagated_tags)
    but its VALUE propagates as null until the source is fully
    assigned — so the consumer's declared-tag obligation is met while
    a value read would fail."""
    src = P + """
template Pack(n) {
    signal input in[n];
    signal output {maxbit} out[n];
    out.maxbit = 8;
    for (var k = 0; k < n; k++) { out[k] <== in[k]; }
}
template NeedVal() {
    signal input {maxbit} v;
    signal output o;
    o <== v;
}
template Main() {
    signal input x;
    signal output out;
    component p = Pack(2);
    p.in[0] <== x;
    p.in[1] <== x;
    signal {maxbit} mid[2];
    mid[0] <== p.out[0];
    component n = NeedVal();
    n.v <== mid[0];            // mid half-assigned: maxbit value is null
    out <== n.o;
    mid[1] <== p.out[1];
}
component main = Main();
"""
    cc = compile_source(src)
    w = cc.witness_host({"x": 7})
    assert w[1] == 7


def test_fully_assigned_source_propagates_value():
    """Control: once the source array is FULLY assigned, both the
    inherited tag and its value propagate (remaining_inserts == 0)."""
    src = P + BITIFY + CONSUMER + """
template Main() {
    signal input x;
    signal output out;
    component b = Bitify();
    b.in <== x;
    signal arr[2];
    arr[0] <== b.out;
    arr[1] <== b.out;
    component c = Consumer();
    c.b <== arr[0];            // arr fully assigned: {binary} flows
    out <== c.out;
}
component main = Main();
"""
    cc = compile_source(src)
    assert cc.witness_host({"x": 1})[1] == 1


# ---------------------------------------------------------------------------
# Per-field bus tag propagation (perform_tag_propagation_bus,
# assignment_utils.rs:130; TagWire.fields, type_definitions.rs:21-23).
# Field tags live in the same dicts as wire tags, under dotted paths.
# ---------------------------------------------------------------------------

PT = """
bus Pt() {
    signal {binary} x;
    signal y;
}
"""

NESTED = """
bus In2() {
    signal {maxbit} v;
}
bus Out2() {
    In2() n;
    signal w;
}
"""


def test_bus_field_tag_required_by_subcomponent_input():
    """A tagged bus FIELD is a caller obligation at the component
    boundary: assigning arithmetic (no tags) into the field reports
    AssignmentMissingTags (handle_tag_assignment_no_init walks
    TagWire.fields by the assigned path)."""
    src = P + PT + """
template Sub() {
    input Pt() p;
    signal output out;
    out <== p.x + p.y;
}
template Main() {
    signal input in;
    component s = Sub();
    s.p.x <== in * 1;
    s.p.y <== in;
    signal output out <== s.out;
}
component main = Main();
"""
    expect(src, "T2040")


def test_bus_field_tag_satisfied_by_tagged_scalar():
    """The same field assignment from a {binary}-tagged scalar source
    satisfies the obligation."""
    src = P + BITIFY + PT + """
template Sub() {
    input Pt() p;
    signal output out;
    out <== p.x + p.y;
}
template Main() {
    signal input in;
    component b = Bitify();
    b.in <== in;
    component s = Sub();
    s.p.x <== b.out;
    s.p.y <== in;
    signal output out <== s.out;
}
component main = Main();
"""
    assert reports_of(src) == []


def test_bus_field_tag_value_visible_inside_subcomponent():
    """A user-fixed field tag value (`q.x.binary = 1`) propagates
    through the whole-bus input assignment and is readable INSIDE the
    child (preset_input_tags with dotted paths; the value also enters
    the instance memo key)."""
    src = P + PT + """
template Sub() {
    input Pt() p;
    signal output out;
    out <== p.x * p.x.binary + p.y;
}
template Main() {
    signal input in;
    Pt() q;
    q.x.binary = 1;
    q.x <== in * in;
    q.y <== in;
    component s = Sub();
    s.p <== q;
    signal output out <== s.out;
}
component main = Main();
"""
    cc = compile_source(src, simplification="O0")
    w = cc.witness_host({"in": 3})
    # out = x*1 + y = 9 + 3
    assert w[1] == 12


def test_nested_bus_field_tag_value_through_component():
    """Nested recursion: a value-fixed tag two levels deep
    (out.n.v.maxbit) set by the CHILD on its output bus is exported to
    the caller and readable as `s.o.n.v.maxbit`
    (insert_tags_output path-walk analog)."""
    src = P + NESTED + """
template Sub() {
    signal input a;
    output Out2() o;
    o.n.v.maxbit = 8;
    o.n.v <== a;
    o.w <== a + 1;
}
template Main() {
    signal input in;
    component s = Sub();
    s.a <== in;
    signal output out <== s.o.n.v + s.o.n.v.maxbit;
}
component main = Main();
"""
    cc = compile_source(src, simplification="O0")
    w = cc.witness_host({"in": 5})
    assert w[1] == 13  # 5 + 8


def test_bus_array_partial_assignment_intersects_field_tag_value():
    """Partial assignments of a bus ARRAY intersect field tag values:
    two sources fixing different values for x.binary leave the wire's
    field tag valueless — reading it afterwards errors ("only have a
    tag in case it inherits the tag in all positions")."""
    src = P + PT + """
template MkPt(b) {
    signal input in;
    output Pt() o;
    o.x.binary = b;
    o.x <== in;
    o.y <== in + 1;
}
template Main() {
    signal input in;
    component m0 = MkPt(0);
    component m1 = MkPt(1);
    m0.in <== in;
    m1.in <== in;
    Pt() p[2];
    p[0] <== m0.o;
    p[1] <== m1.o;
    signal output out <== p[0].x + p[1].x.binary;
}
component main = Main();
"""
    expect(src, "T2048")  # x.binary has no value after intersection


def test_wire_level_bus_tag_not_satisfiable_field_wise():
    """A wire-level tag on an input bus is an obligation at the WIRE
    level: assigning every field individually never runs the wire-level
    check, so the obligation stays unfulfilled — the reference's
    unassigned_tags never drains (component_representation.rs:719-723)
    and here it reports T2040 when the inputs complete."""
    src = P + """
bus Point() { signal x; signal y; }
template Sub() {
    input Point() {goodpoint} p;
    signal output out;
    out <== p.x + p.y;
}
template Main() {
    signal input a;
    signal input b;
    component c = Sub();
    c.p.x <== a;
    c.p.y <== b;
    signal output out <== c.out;
}
component main = Main();
"""
    expect(src, "T2040")


def test_wire_level_bus_tag_satisfied_whole_bus():
    """Control: the same input accepts a whole-bus assignment from a
    source carrying the wire-level tag."""
    src = P + """
bus Point() { signal x; signal y; }
template Mk() {
    signal input a;
    output Point() {goodpoint} o;
    o.x <== a; o.y <== a + 1;
}
template Sub() {
    input Point() {goodpoint} p;
    signal output out;
    out <== p.x + p.y;
}
template Main() {
    signal input a;
    component m = Mk();
    m.a <== a;
    component c = Sub();
    c.p <== m.o;
    signal output out <== c.out;
}
component main = Main();
"""
    assert reports_of(src) == []

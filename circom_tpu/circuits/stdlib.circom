pragma circom 2.0.0;

// Standard gadget library: the circomlib-shape building blocks a
// reference user expects (bitify / comparators / gates / mux).
// Original implementations of the standard R1CS gadget math; outputs
// carry the same template/signal names circomlib consumers use.

template Num2Bits(n) {
    signal input in;
    signal output out[n];
    var acc = 0;
    var pw = 1;
    for (var i = 0; i < n; i++) {
        out[i] <-- (in >> i) & 1;
        out[i] * (out[i] - 1) === 0;
        acc += out[i] * pw;
        pw = pw + pw;
    }
    acc === in;
}

template Bits2Num(n) {
    signal input in[n];
    signal output out;
    var acc = 0;
    var pw = 1;
    for (var i = 0; i < n; i++) {
        acc += in[i] * pw;
        pw = pw + pw;
    }
    out <== acc;
}

template IsZero() {
    signal input in;
    signal output out;
    signal inv;
    inv <-- in != 0 ? 1 / in : 0;
    out <== 1 - in * inv;
    in * out === 0;
}

template IsEqual() {
    signal input in[2];
    signal output out;
    component z = IsZero();
    z.in <== in[1] - in[0];
    out <== z.out;
}

// in[0] < in[1] for n-bit operands (n <= 252): compare via the carry
// bit of in[0] - in[1] + 2^n
template LessThan(n) {
    signal input in[2];
    signal output out;
    component b = Num2Bits(n + 1);
    b.in <== in[0] + (1 << n) - in[1];
    out <== 1 - b.out[n];
}

template LessEqThan(n) {
    signal input in[2];
    signal output out;
    component lt = LessThan(n);
    lt.in[0] <== in[0];
    lt.in[1] <== in[1] + 1;
    out <== lt.out;
}

template GreaterThan(n) {
    signal input in[2];
    signal output out;
    component lt = LessThan(n);
    lt.in[0] <== in[1];
    lt.in[1] <== in[0];
    out <== lt.out;
}

template GreaterEqThan(n) {
    signal input in[2];
    signal output out;
    component lt = LessThan(n);
    lt.in[0] <== in[1];
    lt.in[1] <== in[0] + 1;
    out <== lt.out;
}

// boolean gates over {0,1} signals
template XOR() {
    signal input a;
    signal input b;
    signal output out;
    out <== a + b - 2*a*b;
}

template AND() {
    signal input a;
    signal input b;
    signal output out;
    out <== a*b;
}

template OR() {
    signal input a;
    signal input b;
    signal output out;
    out <== a + b - a*b;
}

template NOT() {
    signal input in;
    signal output out;
    out <== 1 - in;
}

template Mux1() {
    signal input c[2];
    signal input s;
    signal output out;
    out <== c[0] + s * (c[1] - c[0]);
}

// outputs (L,R) = sel ? (R_in,L_in) : (L_in,R_in)
template Switcher() {
    signal input sel;
    signal input L;
    signal input R;
    signal output outL;
    signal output outR;
    signal aux;
    aux <== (R - L) * sel;
    outL <== aux + L;
    outR <== -aux + R;
}

// Merkle tree inclusion proof (Poseidon(2) hash), BASELINE config 5.
// Include poseidon.circom before this file.
pragma circom 2.0.0;

// s = 0 -> out = (a, b); s = 1 -> out = (b, a); s must be a bit.
template Switcher() {
    signal input s;
    signal input a;
    signal input b;
    signal output outL;
    signal output outR;
    s * (s - 1) === 0;
    signal aux;
    aux <== (b - a) * s;
    outL <== aux + a;
    outR <== -aux + b;
}

template MerkleInclusion(depth) {
    signal input leaf;
    signal input pathElements[depth];
    signal input pathIndex[depth];   // bits, LSB first
    signal output root;

    component sw[depth];
    component h[depth];
    signal cur[depth + 1];
    cur[0] <== leaf;
    for (var i = 0; i < depth; i++) {
        sw[i] = Switcher();
        sw[i].s <== pathIndex[i];
        sw[i].a <== cur[i];
        sw[i].b <== pathElements[i];
        h[i] = Poseidon2();
        h[i].inputs[0] <== sw[i].outL;
        h[i].inputs[1] <== sw[i].outR;
        cur[i + 1] <== h[i].out;
    }
    root <== cur[depth];
}

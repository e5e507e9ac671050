// SHA-256 compression (single 512-bit block), heavy bitwise benchmark
// (BASELINE config 3). Written from scratch for this framework.
//
// Conventions: 32-bit words as bit arrays, LSB first (w[i] = bit i).
// Block input: in[512], in[32*j + i] = bit i of big-endian word j.
// Output: out[256], out[32*j + i] = bit i of hash word j.
pragma circom 2.0.0;

// out = a XOR b XOR c, one product per bit via factoring:
// out = a*(1 - 2b - 2c + 4bc) + b + c - 2bc
template Xor3W() {
    signal input a[32];
    signal input b[32];
    signal input c[32];
    signal output out[32];
    signal mid[32];
    for (var k = 0; k < 32; k++) {
        mid[k] <== b[k] * c[k];
        out[k] <== a[k] * (1 - 2*b[k] - 2*c[k] + 4*mid[k]) + b[k] + c[k] - 2*mid[k];
    }
}

// Ch(e,f,g) = e ? f : g  ==  e*(f-g) + g
template ChW() {
    signal input e[32];
    signal input f[32];
    signal input g[32];
    signal output out[32];
    for (var k = 0; k < 32; k++) {
        out[k] <== e[k] * (f[k] - g[k]) + g[k];
    }
}

// Maj(a,b,c) = ab + ac + bc - 2abc == a*(b + c - 2bc) + bc
template MajW() {
    signal input a[32];
    signal input b[32];
    signal input c[32];
    signal output out[32];
    signal mid[32];
    for (var k = 0; k < 32; k++) {
        mid[k] <== b[k] * c[k];
        out[k] <== a[k] * (b[k] + c[k] - 2*mid[k]) + mid[k];
    }
}

// sum of `n` 32-bit words (given as bit arrays) mod 2^32, with binary
// output; nbits covers the carry range (32 + clog2(n)).
template AddModW(n, nbits) {
    signal input words[n][32];
    signal output out[32];
    signal bits[nbits];
    var lc = 0;
    for (var j = 0; j < n; j++) {
        for (var k = 0; k < 32; k++) {
            lc += words[j][k] * 2 ** k;
        }
    }
    var acc = 0;
    for (var k = 0; k < nbits; k++) {
        bits[k] <-- (lc >> k) & 1;
        bits[k] * (bits[k] - 1) === 0;
        acc += bits[k] * 2 ** k;
    }
    acc === lc;
    for (var k = 0; k < 32; k++) {
        out[k] <== bits[k];
    }
}

function SHA_K(t) {
    var k[64] = [
        0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b,
        0x59f111f1, 0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01,
        0x243185be, 0x550c7dc3, 0x72be5d74, 0x80deb1fe, 0x9bdc06a7,
        0xc19bf174, 0xe49b69c1, 0xefbe4786, 0x0fc19dc6, 0x240ca1cc,
        0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da, 0x983e5152,
        0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
        0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc,
        0x53380d13, 0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85,
        0xa2bfe8a1, 0xa81a664b, 0xc24b8b70, 0xc76c51a3, 0xd192e819,
        0xd6990624, 0xf40e3585, 0x106aa070, 0x19a4c116, 0x1e376c08,
        0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a, 0x5b9cca4f,
        0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
        0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2
    ];
    return k[t];
}

function SHA_IV(j) {
    var h[8] = [
        0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
        0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19
    ];
    return h[j];
}

// sigma0 = rotr7 ^ rotr18 ^ shr3 ; sigma1 = rotr17 ^ rotr19 ^ shr10
template SmallSigma(r1, r2, s3) {
    signal input in[32];
    signal output out[32];
    component x = Xor3W();
    for (var k = 0; k < 32; k++) {
        x.a[k] <== in[(k + r1) % 32];
        x.b[k] <== in[(k + r2) % 32];
        x.c[k] <== k + s3 < 32 ? in[k + s3] : 0;
    }
    for (var k = 0; k < 32; k++) {
        out[k] <== x.out[k];
    }
}

// Sigma0 = rotr2 ^ rotr13 ^ rotr22 ; Sigma1 = rotr6 ^ rotr11 ^ rotr25
template BigSigma(r1, r2, r3) {
    signal input in[32];
    signal output out[32];
    component x = Xor3W();
    for (var k = 0; k < 32; k++) {
        x.a[k] <== in[(k + r1) % 32];
        x.b[k] <== in[(k + r2) % 32];
        x.c[k] <== in[(k + r3) % 32];
    }
    for (var k = 0; k < 32; k++) {
        out[k] <== x.out[k];
    }
}

template Sha256Compress() {
    signal input hin[256];
    signal input in[512];
    signal output out[256];

    // message schedule
    signal w[64][32];
    component s0[48];
    component s1[48];
    component wadd[48];
    for (var t = 0; t < 16; t++) {
        for (var k = 0; k < 32; k++) {
            w[t][k] <== in[32 * t + k];
            in[32 * t + k] * (in[32 * t + k] - 1) === 0;
        }
    }
    for (var t = 16; t < 64; t++) {
        s0[t - 16] = SmallSigma(7, 18, 3);
        s1[t - 16] = SmallSigma(17, 19, 10);
        for (var k = 0; k < 32; k++) {
            s0[t - 16].in[k] <== w[t - 15][k];
            s1[t - 16].in[k] <== w[t - 2][k];
        }
        wadd[t - 16] = AddModW(4, 34);
        for (var k = 0; k < 32; k++) {
            wadd[t - 16].words[0][k] <== s1[t - 16].out[k];
            wadd[t - 16].words[1][k] <== w[t - 7][k];
            wadd[t - 16].words[2][k] <== s0[t - 16].out[k];
            wadd[t - 16].words[3][k] <== w[t - 16][k];
        }
        for (var k = 0; k < 32; k++) {
            w[t][k] <== wadd[t - 16].out[k];
        }
    }

    // working variables over 64 rounds
    signal a[65][32];
    signal b[65][32];
    signal c[65][32];
    signal d[65][32];
    signal e[65][32];
    signal f[65][32];
    signal g[65][32];
    signal h[65][32];
    for (var k = 0; k < 32; k++) {
        a[0][k] <== hin[k];
        b[0][k] <== hin[32 + k];
        c[0][k] <== hin[64 + k];
        d[0][k] <== hin[96 + k];
        e[0][k] <== hin[128 + k];
        f[0][k] <== hin[160 + k];
        g[0][k] <== hin[192 + k];
        h[0][k] <== hin[224 + k];
    }

    component bs0[64];
    component bs1[64];
    component ch[64];
    component mj[64];
    component t1a[64];
    component t2a[64];
    for (var t = 0; t < 64; t++) {
        bs1[t] = BigSigma(6, 11, 25);
        ch[t] = ChW();
        bs0[t] = BigSigma(2, 13, 22);
        mj[t] = MajW();
        for (var k = 0; k < 32; k++) {
            bs1[t].in[k] <== e[t][k];
            ch[t].e[k] <== e[t][k];
            ch[t].f[k] <== f[t][k];
            ch[t].g[k] <== g[t][k];
            bs0[t].in[k] <== a[t][k];
            mj[t].a[k] <== a[t][k];
            mj[t].b[k] <== b[t][k];
            mj[t].c[k] <== c[t][k];
        }
        // T1 = h + Sigma1(e) + Ch(e,f,g) + K[t] + w[t]   (5 words, 35 bits)
        // then e' = d + T1 (we fold: e' = d + h + S1 + ch + K + w: 6 words)
        // and a' = T1 + T2 = h + S1 + ch + K + w + S0 + maj (7 words)
        t1a[t] = AddModW(6, 35);
        t2a[t] = AddModW(7, 35);
        for (var k = 0; k < 32; k++) {
            t1a[t].words[0][k] <== d[t][k];
            t1a[t].words[1][k] <== h[t][k];
            t1a[t].words[2][k] <== bs1[t].out[k];
            t1a[t].words[3][k] <== ch[t].out[k];
            t1a[t].words[4][k] <== (SHA_K(t) >> k) & 1;
            t1a[t].words[5][k] <== w[t][k];

            t2a[t].words[0][k] <== h[t][k];
            t2a[t].words[1][k] <== bs1[t].out[k];
            t2a[t].words[2][k] <== ch[t].out[k];
            t2a[t].words[3][k] <== (SHA_K(t) >> k) & 1;
            t2a[t].words[4][k] <== w[t][k];
            t2a[t].words[5][k] <== bs0[t].out[k];
            t2a[t].words[6][k] <== mj[t].out[k];
        }
        for (var k = 0; k < 32; k++) {
            h[t + 1][k] <== g[t][k];
            g[t + 1][k] <== f[t][k];
            f[t + 1][k] <== e[t][k];
            e[t + 1][k] <== t1a[t].out[k];
            d[t + 1][k] <== c[t][k];
            c[t + 1][k] <== b[t][k];
            b[t + 1][k] <== a[t][k];
            a[t + 1][k] <== t2a[t].out[k];
        }
    }

    // final addition with IV
    component fin[8];
    for (var j = 0; j < 8; j++) {
        fin[j] = AddModW(2, 33);
    }
    for (var k = 0; k < 32; k++) {
        fin[0].words[0][k] <== a[64][k];
        fin[1].words[0][k] <== b[64][k];
        fin[2].words[0][k] <== c[64][k];
        fin[3].words[0][k] <== d[64][k];
        fin[4].words[0][k] <== e[64][k];
        fin[5].words[0][k] <== f[64][k];
        fin[6].words[0][k] <== g[64][k];
        fin[7].words[0][k] <== h[64][k];
        for (var j = 0; j < 8; j++) {
            fin[j].words[1][k] <== hin[32 * j + k];
        }
    }
    for (var j = 0; j < 8; j++) {
        for (var k = 0; k < 32; k++) {
            out[32 * j + k] <== fin[j].out[k];
        }
    }
}


template Sha256Block() {
    signal input in[512];
    signal output out[256];
    component c = Sha256Compress();
    for (var k = 0; k < 256; k++) { c.hin[k] <== (SHA_IV(k \ 32) >> (k % 32)) & 1; }
    for (var i = 0; i < 512; i++) { c.in[i] <== in[i]; }
    for (var k = 0; k < 256; k++) { out[k] <== c.out[k]; }
}

// full multi-block compression chain over pre-padded message blocks
// (the scale axis: witness cost grows linearly in nBlocks, compile
// cost stays one memoized Sha256Compress instance)
template Sha256(nBlocks) {
    signal input in[nBlocks][512];
    signal output out[256];
    component c[nBlocks];
    for (var b = 0; b < nBlocks; b++) {
        c[b] = Sha256Compress();
        for (var i = 0; i < 512; i++) { c[b].in[i] <== in[b][i]; }
        for (var k = 0; k < 256; k++) {
            if (b == 0) {
                c[b].hin[k] <== (SHA_IV(k \ 32) >> (k % 32)) & 1;
            } else {
                c[b].hin[k] <== c[b-1].out[k];
            }
        }
    }
    for (var k = 0; k < 256; k++) { out[k] <== c[nBlocks-1].out[k]; }
}

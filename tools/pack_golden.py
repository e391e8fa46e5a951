#!/usr/bin/env python3
"""Pack golden test vectors (dumped by the reference-oracle harness) into .npz files.

The raw .bin files are produced by a small C harness that #includes the reference
encoder translation unit (/root/reference/src/HEVCe.c) and calls its internal
functions on random inputs. Only the packed .npz DATA is committed to this repo;
no reference code is. Format of each .bin is documented inline below.

Usage: python tools/pack_golden.py <bin_dir> <out_dir>
"""
import sys
import numpy as np

CTU = 32


class Reader:
    def __init__(self, path):
        self.buf = np.fromfile(path, dtype=np.uint8)
        self.pos = 0

    def i32(self, n=1):
        a = self.buf[self.pos:self.pos + 4 * n].view(np.int32).copy()
        self.pos += 4 * n
        return int(a[0]) if n == 1 else a

    def u8(self, n):
        a = self.buf[self.pos:self.pos + n].copy()
        self.pos += n
        return a

    def done(self):
        assert self.pos == len(self.buf), (self.pos, len(self.buf))


def pack_border(src, dst):
    r = Reader(src)
    n = r.i32()
    recs = dict(sz=[], flags=[], rcon=[], ubla=[], ublb=[], ubar=[], fbla=[], fblb=[], fbar=[])
    for _ in range(n):
        recs['sz'].append(r.i32())
        recs['flags'].append([r.i32() for _ in range(4)])
        recs['rcon'].append(r.u8((1 + 64) * (1 + CTU * 2)).reshape(1 + 64, 1 + CTU * 2))
        recs['ubla'].append(r.u8(1))
        recs['ublb'].append(r.u8(CTU * 2))
        recs['ubar'].append(r.u8(CTU * 2))
        recs['fbla'].append(r.u8(1))
        recs['fblb'].append(r.u8(CTU * 2))
        recs['fbar'].append(r.u8(CTU * 2))
    r.done()
    np.savez_compressed(dst, **{k: np.asarray(v) for k, v in recs.items()})


def pack_predict(src, dst):
    r = Reader(src)
    n = r.i32()
    recs = dict(sz=[], pmode=[], ubla=[], ublb=[], ubar=[], fbla=[], fblb=[], fbar=[], out=[])
    for _ in range(n):
        sz = r.i32()
        recs['sz'].append(sz)
        recs['pmode'].append(r.i32())
        recs['ubla'].append(r.u8(1))
        recs['ublb'].append(r.u8(64))
        recs['ubar'].append(r.u8(64))
        recs['fbla'].append(r.u8(1))
        recs['fblb'].append(r.u8(64))
        recs['fbar'].append(r.u8(64))
        out = np.zeros((CTU, CTU), np.uint8)
        out[:sz, :sz] = r.u8(sz * sz).reshape(sz, sz)
        recs['out'].append(out)
    r.done()
    np.savez_compressed(dst, **{k: np.asarray(v) for k, v in recs.items()})


def pack_xform(src, dst):
    r = Reader(src)
    n = r.i32()
    recs = dict(sz=[], inverse=[], src=[], out=[])
    for _ in range(n):
        sz = r.i32()
        recs['sz'].append(sz)
        recs['inverse'].append(r.i32())
        a = np.zeros((CTU, CTU), np.int32)
        a[:sz, :sz] = r.i32(sz * sz).reshape(sz, sz)
        recs['src'].append(a)
        b = np.zeros((CTU, CTU), np.int32)
        b[:sz, :sz] = r.i32(sz * sz).reshape(sz, sz)
        recs['out'].append(b)
    r.done()
    np.savez_compressed(dst, **{k: np.asarray(v) for k, v in recs.items()})


def pack_quant(src, dst):
    r = Reader(src)
    n = r.i32()
    recs = dict(sz=[], qpd6=[], src=[], quant=[], dequant=[])
    for _ in range(n):
        sz = r.i32()
        recs['sz'].append(sz)
        recs['qpd6'].append(r.i32())
        for k in ('src', 'quant', 'dequant'):
            a = np.zeros((CTU, CTU), np.int32)
            a[:sz, :sz] = r.i32(sz * sz).reshape(sz, sz)
            recs[k].append(a)
    r.done()
    np.savez_compressed(dst, **{k: np.asarray(v) for k, v in recs.items()})


def pack_tables(src, dst):
    r = Reader(src)
    coeff_rate = r.i32(256)
    ctx_init = np.stack([r.i32(256) for _ in range(5)])
    r.done()
    np.savez_compressed(dst, coeff_rate=coeff_rate, ctx_init=ctx_init)


def pack_cabac(src, dst):
    r = Reader(src)
    ntest, nops = r.i32(), r.i32()
    recs = dict(qpd6=[], kind=[], a=[], b=[], length=[], nbytes=[], stream=[], ctxs=[])
    maxstream = 0
    raw = []
    for _ in range(ntest):
        q = r.i32()
        kinds, aa, bb, ll = [], [], [], []
        for _ in range(nops):
            kinds.append(r.i32())
            aa.append(r.i32())
            bb.append(r.i32())
            ll.append(r.i32())
        cnt = r.i32()
        stream = r.u8(cnt)
        ctxs = r.u8(142)
        raw.append((q, kinds, aa, bb, ll, stream, ctxs))
        maxstream = max(maxstream, cnt)
    r.done()
    for q, kinds, aa, bb, ll, stream, ctxs in raw:
        recs['qpd6'].append(q)
        recs['kind'].append(kinds)
        recs['a'].append(aa)
        recs['b'].append(bb)
        recs['length'].append(ll)
        recs['nbytes'].append(len(stream))
        s = np.zeros(maxstream, np.uint8)
        s[:len(stream)] = stream
        recs['stream'].append(s)
        recs['ctxs'].append(ctxs)
    np.savez_compressed(dst, **{k: np.asarray(v) for k, v in recs.items()})


def pack_putcoef(src, dst):
    r = Reader(src)
    n = r.i32()
    recs = dict(sz=[], qpd6=[], pmode=[], blk=[], length=[], nbytes=[], stream=[], ctxs=[])
    raw = []
    maxstream = 0
    for _ in range(n):
        sz, q, pm = r.i32(), r.i32(), r.i32()
        a = np.zeros((CTU, CTU), np.int32)
        a[:sz, :sz] = r.i32(sz * sz).reshape(sz, sz)
        length = r.i32()
        cnt = r.i32()
        stream = r.u8(cnt)
        ctxs = r.u8(142)
        raw.append((sz, q, pm, a, length, stream, ctxs))
        maxstream = max(maxstream, cnt)
    r.done()
    for sz, q, pm, a, length, stream, ctxs in raw:
        recs['sz'].append(sz)
        recs['qpd6'].append(q)
        recs['pmode'].append(pm)
        recs['blk'].append(a)
        recs['length'].append(length)
        recs['nbytes'].append(len(stream))
        s = np.zeros(maxstream, np.uint8)
        s[:len(stream)] = stream
        recs['stream'].append(s)
        recs['ctxs'].append(ctxs)
    np.savez_compressed(dst, **{k: np.asarray(v) for k, v in recs.items()})


def pack_images(src, dst):
    r = Reader(src)
    n = r.i32()
    out = {}
    for t in range(n):
        ysz, xsz, q = r.i32(), r.i32(), r.i32()
        img = r.u8(ysz * xsz).reshape(ysz, xsz)
        y2, x2 = r.i32(), r.i32()
        length = r.i32()
        stream = r.u8(length)
        rcon = r.u8(y2 * x2).reshape(y2, x2)
        out[f'img_{t}'] = img
        out[f'qpd6_{t}'] = np.int32(q)
        out[f'stream_{t}'] = stream
        out[f'rcon_{t}'] = rcon
    r.done()
    out['n'] = np.int32(n)
    np.savez_compressed(dst, **out)


def main():
    bin_dir, out_dir = sys.argv[1], sys.argv[2]
    pack_border(f'{bin_dir}/border.bin', f'{out_dir}/golden_border.npz')
    pack_predict(f'{bin_dir}/predict.bin', f'{out_dir}/golden_predict.npz')
    pack_xform(f'{bin_dir}/xform.bin', f'{out_dir}/golden_xform.npz')
    pack_quant(f'{bin_dir}/quant.bin', f'{out_dir}/golden_quant.npz')
    pack_tables(f'{bin_dir}/tables.bin', f'{out_dir}/golden_tables.npz')
    pack_cabac(f'{bin_dir}/cabac.bin', f'{out_dir}/golden_cabac.npz')
    pack_putcoef(f'{bin_dir}/putcoef.bin', f'{out_dir}/golden_putcoef.npz')
    pack_images(f'{bin_dir}/images.bin', f'{out_dir}/golden_images.npz')
    print('packed.')


if __name__ == '__main__':
    main()


# Regeneration: the raw .bin inputs are produced by tools/gen_golden_vectors.c,
# a harness that #includes the reference translation unit as an oracle:
#   cp tools/gen_golden_vectors.c /tmp/gv/ && cd /tmp/gv
#   cp /root/reference/src/HEVCe.c /root/reference/src/HEVCe.h .
#   gcc -O2 gen_golden_vectors.c -lm -o genvec && ./genvec .
#   python tools/pack_golden.py /tmp/gv tests/data

#!/usr/bin/env python3
"""Minimal hprof parser: find reference paths from GC roots to target objects.

Usage: hprof_path.py <dump.hprof> <className> <intFieldName> <val1,val2,...>
Finds instances of className whose int field intFieldName is in the value set,
then BFS from GC roots over the object graph and prints one path per target.
"""
import struct, sys
from collections import deque

TYPE_SIZES = {2: None, 4: 1, 5: 2, 6: 4, 7: 8, 8: 1, 9: 2, 10: 4, 11: 8}


def parse(path):
    data = open(path, 'rb').read()
    # header
    z = data.index(b'\0')
    idsz = struct.unpack_from('>I', data, z + 1)[0]
    pos = z + 1 + 4 + 8
    idfmt = '>Q' if idsz == 8 else '>I'

    strings = {}
    cls_name = {}          # classObjId -> name string id
    cls_dump = {}          # classObjId -> (super, [(fieldNameId, ty)], instSize, statics[(nameId, objref)])
    instances = {}         # objId -> (classObjId, offset_of_field_bytes, nbytes)
    objarrays = {}         # objId -> (offset, count)
    roots = []             # (objId, kind, extra) extra=(threadSerial, frameNum) for stack roots
    frames = {}            # frameId -> (methodNameId, sourceFileId, line)
    traces = {}            # traceSerial -> (threadSerial, [frameIds])

    def rid(p):
        return struct.unpack_from(idfmt, data, p)[0]

    n = len(data)
    while pos < n:
        tag = data[pos]
        length = struct.unpack_from('>I', data, pos + 5)[0]
        body = pos + 9
        if tag == 0x01:
            sid = rid(body)
            strings[sid] = data[body + idsz:body + length].decode('utf-8', 'replace')
        elif tag == 0x02:
            cid = rid(body + 4)
            nameid = rid(body + 4 + idsz + 4)
            cls_name[cid] = nameid
        elif tag == 0x04:
            fid = rid(body)
            mname = rid(body + idsz)
            srcf = rid(body + idsz * 3)
            line = struct.unpack_from('>i', data, body + idsz * 4 + 4)[0]
            frames[fid] = (mname, srcf, line)
        elif tag == 0x05:
            ser, thser, nfr = struct.unpack_from('>III', data, body)
            traces[ser] = (thser, [rid(body + 12 + i * idsz) for i in range(nfr)])
        elif tag in (0x0C, 0x1C):
            p = body
            end = body + length
            while p < end:
                st = data[p]
                p += 1
                if st == 0xFF or st in (0x05, 0x07):
                    roots.append((rid(p), st, None)); p += idsz
                elif st == 0x01:
                    roots.append((rid(p), st, None)); p += idsz * 2
                elif st in (0x02, 0x03):
                    ts, fn = struct.unpack_from('>Ii', data, p + idsz)
                    roots.append((rid(p), st, (ts, fn))); p += idsz + 8
                elif st in (0x04, 0x06):
                    ts = struct.unpack_from('>I', data, p + idsz)[0]
                    roots.append((rid(p), st, (ts,))); p += idsz + 4
                elif st == 0x08:
                    ts, trs = struct.unpack_from('>II', data, p + idsz)
                    roots.append((rid(p), st, (ts, trs))); p += idsz + 8
                elif st == 0x20:
                    cid = rid(p); p += idsz + 4
                    sup = rid(p); p += idsz * 6 + 4
                    cpn = struct.unpack_from('>H', data, p)[0]; p += 2
                    for _ in range(cpn):
                        ty = data[p + 2]; p += 3 + (idsz if ty == 2 else TYPE_SIZES[ty])
                    sn = struct.unpack_from('>H', data, p)[0]; p += 2
                    statics = []
                    for _ in range(sn):
                        nmid = rid(p); ty = data[p + idsz]; p += idsz + 1
                        if ty == 2:
                            statics.append((nmid, rid(p))); p += idsz
                        else:
                            p += TYPE_SIZES[ty]
                    fn = struct.unpack_from('>H', data, p)[0]; p += 2
                    fields = []
                    for _ in range(fn):
                        nmid = rid(p); ty = data[p + idsz]; p += idsz + 1
                        fields.append((nmid, ty))
                    cls_dump[cid] = (sup, fields, statics)
                elif st == 0x21:
                    oid = rid(p); p += idsz + 4
                    cid = rid(p); p += idsz
                    nb = struct.unpack_from('>I', data, p)[0]; p += 4
                    instances[oid] = (cid, p, nb)
                    p += nb
                elif st == 0x22:
                    oid = rid(p); p += idsz + 4
                    cnt = struct.unpack_from('>I', data, p)[0]; p += 4 + idsz
                    objarrays[oid] = (p, cnt)
                    p += cnt * idsz
                elif st == 0x23:
                    p += idsz + 4
                    cnt = struct.unpack_from('>I', data, p)[0]; p += 4
                    ety = data[p]; p += 1
                    p += cnt * (idsz if ety == 2 else TYPE_SIZES[ety])
                else:
                    raise RuntimeError(f'unknown heap subrecord 0x{st:x} at {p}')
        pos = body + length
    return (data, idsz, idfmt, strings, cls_name, cls_dump, instances,
            objarrays, roots, frames, traces)


def main():
    dump, clsname, fldname, vals = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
    want = set(int(v) for v in vals.split(','))
    (data, idsz, idfmt, strings, cls_name, cls_dump, instances, objarrays,
     roots, frames, traces) = parse(dump)
    print(f'parsed: {len(instances)} instances, {len(objarrays)} obj arrays, '
          f'{len(cls_dump)} classes, {len(roots)} roots', file=sys.stderr)

    def cname(cid):
        return strings.get(cls_name.get(cid, -1), f'class@{cid:x}')

    # field layout cache per class: [(name, ty, offset)]
    layout_cache = {}

    def layout(cid):
        if cid in layout_cache:
            return layout_cache[cid]
        out = []
        off = 0
        c = cid
        while c and c in cls_dump:
            sup, fields, _ = cls_dump[c]
            for nmid, ty in fields:
                sz = idsz if ty == 2 else TYPE_SIZES[ty]
                out.append((strings.get(nmid, '?'), ty, off))
                off += sz
            c = sup
        layout_cache[cid] = out
        return out

    # find targets
    target_cids = [cid for cid in cls_dump if cname(cid) == clsname]
    targets = {}
    for oid, (cid, p, nb) in instances.items():
        if cid in target_cids:
            for nm, ty, off in layout(cid):
                if nm == fldname and ty == 10:
                    v = struct.unpack_from('>i', data, p + off)[0]
                    if v in want:
                        targets[oid] = v
                    break
    print(f'targets found: { {hex(k): v for k, v in targets.items()} }',
          file=sys.stderr)
    if not targets:
        return

    def frame_label(kind, extra):
        if extra is None:
            return f'ROOT:0x{kind:02x}'
        ts = extra[0]
        tr = next((t for t in traces.values() if t[0] == ts), None)
        where = ''
        if kind in (0x02, 0x03) and tr and extra[1] >= 0 and extra[1] < len(tr[1]):
            mname, srcf, line = frames.get(tr[1][extra[1]], (0, 0, 0))
            where = f' {strings.get(mname, "?")}({strings.get(srcf, "?")}:{line})'
        return f'ROOT:0x{kind:02x} thread#{ts}{where}'

    # BFS from roots; edges resolved on the fly
    parent = {}
    q = deque()
    for oid, kind, extra in roots:
        if oid not in parent:
            parent[oid] = (0, frame_label(kind, extra))
            q.append(oid)
    # class statics as roots too
    for cid, (sup, fields, statics) in cls_dump.items():
        for nmid, ref in statics:
            if ref and ref not in parent:
                parent[ref] = (0, f'STATIC {cname(cid)}.{strings.get(nmid, "?")}')
                q.append(ref)

    remaining = set(targets)
    while q and remaining:
        oid = q.popleft()
        # note a reached target but KEEP expanding its fields: another
        # target may only be reachable through this one
        remaining.discard(oid)
        inst = instances.get(oid)
        if inst is not None:
            cid, p, nb = inst
            for nm, ty, off in layout(cid):
                if ty == 2 and off + idsz <= nb:
                    ref = struct.unpack_from(idfmt, data, p + off)[0]
                    if ref and ref not in parent:
                        parent[ref] = (oid, nm)
                        q.append(ref)
        else:
            arr = objarrays.get(oid)
            if arr is not None:
                p, cnt = arr
                for i in range(cnt):
                    ref = struct.unpack_from(idfmt, data, p + i * idsz)[0]
                    if ref and ref not in parent:
                        parent[ref] = (oid, f'[{i}]')
                        q.append(ref)

    for oid, v in targets.items():
        if oid not in parent:
            print(f'\n=== target id={v}: UNREACHABLE from parsed roots ===')
            continue
        print(f'\n=== path to {clsname}[{fldname}={v}] @{oid:x} ===')
        chain = []
        cur = oid
        while cur:
            src, label = parent[cur]
            kind = (cname(instances[cur][0]) if cur in instances
                    else ('objarray' if cur in objarrays else 'prim/class'))
            chain.append((label, kind, cur))
            cur = src
        for label, kind, node in reversed(chain):
            print(f'  --{label}--> {kind} @{node:x}')


if __name__ == '__main__':
    main()

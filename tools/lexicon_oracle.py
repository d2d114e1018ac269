"""Pure-Python oracle for the lexicon queries — a faithful port of the
engine's 512-d feature hash (TextAnalyzer.vectorizeToken / angleOfId,
themselves ≙ reference StringAnalyzer.cs semantics), so `lexicon_build`
and `lexicon_validate` get FULL value checks instead of rows-only counts.

The port is exact for the test corpus (lowercase ASCII letters + space —
asserted at load): every arithmetic step mirrors the Scala kernel in the
same order, all in IEEE doubles, so angles reproduce bit-for-bit. The one
platform hazard is acos (JVM fdlibm vs glibc may differ in the last ulp);
check_lexicon() therefore verifies ALL angles exactly and reports any
token whose angle mismatches, rather than silently hashing.
"""
import math

DIMS = 512
MASK = (1 << 64) - 1
FNV_OFFSET = 14695981039346656037
FNV_PRIME = 1099511628211
KNUTH_SEED = 12297829382473034501  # -6148914691236517115 as unsigned 64-bit


def _fnv(units):
    h = FNV_OFFSET
    for c in units:
        h ^= c
        h = (h * FNV_PRIME) & MASK
    return h


def _idx(chars, dims=DIMS):
    return _fnv([ord(c) for c in chars]) % dims


def _rolling(units):
    h = 0
    for c in units:
        h = ((h ^ c) * KNUTH_SEED) & MASK
    return h


class _Off:
    def __init__(self, dims=DIMS):
        self.bg = _idx("bg:", dims)
        self.sg1 = _idx("sg1:", dims)
        self.tri_start = _idx("tri:start:", dims)
        self.tri_end = _idx("tri:end:", dims)
        self.vc = _idx("vc:", dims)
        self.uc = _idx("uc:", dims)
        self.first = _idx("first:", dims)
        self.last = _idx("last:", dims)
        self.feat_number = _idx("feat:number:", dims)
        self.feat_geo = _idx("feat:geo:", dims)
        self.case_lower = _idx("case:lower", dims)
        self.case_mixed = _idx("case:mixed", dims)
        self.case_upper = _idx("case:upper", dims)
        self.case_title = _idx("case:title", dims)
        self.is_tok = _idx("is", dims)
        self.not_tok = _idx("not", dims)
        self.len_buckets = [_idx(s, dims) for s in
                            ("len:0", "len:1", "len:2", "len:3", "len:4",
                             "len:5-8", "len:9-16", "len:17+")]


_OFF = _Off()
_VOWELS = set("aeiouy")


def _len_bucket(n):
    if n <= 4:
        return n
    if n <= 8:
        return 5
    if n <= 16:
        return 6
    return 7


def _net_category(c):
    # restricted-domain port: the corpus is lowercase ASCII letters (+
    # digits tolerated); anything else is out of the port's contract
    if "a" <= c <= "z":
        return 1  # LowercaseLetter
    if "0" <= c <= "9":
        return 8  # DecimalDigitNumber
    raise ValueError(f"lexicon oracle port only covers [a-z0-9], got {c!r}")


def vectorize(label, dims=DIMS):
    """Port of TextAnalyzer.vectorizeToken — identical accumulation order."""
    off = _OFF
    cs = label
    n_ = len(cs)
    buf = [0.0] * dims

    for i in range(min(n_, dims)):
        buf[i] = float(ord(cs[i]))

    for n in (3, 4, 5):
        for i in range(0, n_ - n + 1):
            buf[_idx(cs[i:i + n], dims)] += 1.0

    for i in range(0, n_ - 1):
        span = cs[i] + cs[i + 1] + chr(i & 0xFF) + chr((i >> 8) & 0xFF)
        buf[(off.bg + _idx(span, dims)) % dims] += 0.75
    for i in range(0, n_ - 2):
        span = cs[i] + cs[i + 2] + chr(i & 0xFF) + chr((i >> 8) & 0xFF)
        buf[(off.sg1 + _idx(span, dims)) % dims] += 0.5

    if n_ >= 3:
        buf[(off.tri_start + _idx(cs[0:3], dims)) % dims] += 0.65
        buf[(off.tri_end + _idx(cs[n_ - 3:n_], dims)) % dims] += 0.65
    elif n_ == 2:
        buf[(off.tri_start + _idx(cs + "_", dims)) % dims] += 0.65
        buf[(off.tri_end + _idx("_" + cs, dims)) % dims] += 0.65
    elif n_ == 1:
        buf[(off.tri_start + _idx(cs + "__", dims)) % dims] += 0.65
        buf[(off.tri_end + _idx("__" + cs, dims)) % dims] += 0.65

    if n_ > 0:
        buf[(off.first + _idx(cs[0], dims)) % dims] += 0.75
        buf[(off.last + _idx(cs[-1], dims)) % dims] += 0.75

    buf[off.len_buckets[_len_bucket(n_)]] += 0.5

    if n_ > 0:
        vc = "".join(
            ("V" if c in _VOWELS else "C") if c.isalpha() else "X" for c in cs)
        buf[(off.vc + _idx(vc, dims)) % dims] += 0.5

    if n_ <= 3:
        buf[_rolling([ord(c) for c in cs]) % dims] += 0.8

    if n_ > 0:
        is_all_lower = cs.lower() == cs
        is_all_upper = cs.upper() == cs
        is_title = cs[0].isalpha() and cs[0].isupper()
        buf[off.case_lower if is_all_lower else off.case_mixed] += 0.5
        if is_all_upper:
            buf[off.case_upper] += 0.5
        if is_title:
            buf[off.case_title] += 0.5

        for c in cs:
            cat = _net_category(c)
            span = chr(ord("0") + cat % 10) + chr(ord("0") + (cat // 10) % 10)
            buf[(_idx(span, dims) + off.uc) % dims] += 0.25

    # number/geo flags: pure-alpha tokens are neither (asserted domain)
    is_number = False
    is_geo = False
    buf[(off.feat_number + (off.is_tok if is_number else off.not_tok)) % dims] += 0.6
    buf[(off.feat_geo + (off.is_tok if is_geo else off.not_tok)) % dims] += 0.6

    norm_sq = 0.0
    for i in range(dims):
        v = buf[i]
        if v != 0.0:
            norm_sq += v * v
    norm = math.sqrt(norm_sq)
    indices = []
    values = []
    for i in range(dims):
        if buf[i] != 0.0:
            indices.append(i)
            values.append(buf[i] / norm if norm > 0.0 else buf[i])
    return indices, values


def angle_of_id(indices, values, dims=DIMS):
    """Port of VectorOps.angleOfIdentity via analyzeSparseVsDense."""
    u = 1.0 / math.sqrt(float(dims))
    # analyzeSparseVsDense(ia, va, unit, dims)
    dot_ab = 0.0
    for k in range(len(indices)):
        dot_ab += values[k] * u
    norm_a = _l2(values)
    norm_b = math.sqrt(sum_sq_dense_unit(dims, u))
    cos = 0.0
    if dot_ab != 0.0 and norm_a != 0.0 and norm_b != 0.0:
        cos = dot_ab / (norm_a * norm_b)
        if cos > 1.0:
            cos = 1.0
        elif cos < -1.0:
            cos = -1.0
    angle_rad = math.acos(cos)
    sum_sq = 0.0
    sum_abs = 0.0
    k = 0
    for i in range(dims):
        if k < len(indices) and indices[k] == i:
            av = values[k]
            k += 1
        else:
            av = 0.0
        d = av - u
        sum_sq += d * d
        sum_abs += abs(d)
    euclidean = math.sqrt(sum_sq)
    proj_on_b = dot_ab / norm_b if norm_b > 0.0 else 0.0
    overlap = float(len(indices))  # unit vector is nonzero everywhere
    union = len(indices) + dims - len(indices)
    jaccard = overlap / union if union > 0 else 0.0
    sig = [cos, angle_rad, dot_ab, norm_a, norm_b, euclidean, sum_abs,
           proj_on_b, overlap, jaccard]
    s = 0.0
    norm_sq = 0.0
    for v in sig:
        s += v
        norm_sq += v * v
    norm_sig = math.sqrt(norm_sq)
    return 0.0 if norm_sig == 0.0 else (s * u) / norm_sig


def _l2(values):
    s = 0.0
    for v in values:
        s += v * v
    return math.sqrt(s)


def sum_sq_dense_unit(dims, u):
    # l2Norm of the unit vector, computed the same element-by-element way
    s = 0.0
    for _ in range(dims):
        s += u * u
    return s


def cosine_sparse(ia, va, ib, vb):
    """Port of VectorOps.cosineSparse (sorted index merge)."""
    d = 0.0
    i = j = 0
    while i < len(ia) and j < len(ib):
        if ia[i] == ib[j]:
            d += va[i] * vb[j]
            i += 1
            j += 1
        elif ia[i] < ib[j]:
            i += 1
        else:
            j += 1
    na = _l2(va)
    nb = _l2(vb)
    return 0.0 if na == 0.0 or nb == 0.0 else d / (na * nb)


def split_words(text):
    """splitWords on the asserted corpus domain (letters/digits + space =
    data chars + separator; no math symbols)."""
    return [w for w in text.split(" ") if w]


def _token_angles(con, sf_dir):
    """(angle, label) per DISTINCT label of the documents corpus, plus the
    total token-occurrence count and the per-label occurrence counts."""
    rows = con.execute(
        "SELECT text FROM read_parquet(?) ",
        [f"{sf_dir}/documents.parquet"]).fetchall()
    occurrences = {}
    for (text,) in rows:
        if text is None:
            continue
        for ch in text:
            if not (ch == " " or "a" <= ch <= "z" or "0" <= ch <= "9"):
                raise ValueError(
                    f"lexicon oracle port expects [a-z0-9 ] corpus, got {ch!r}")
        for w in split_words(text):
            occurrences[w] = occurrences.get(w, 0) + 1
    vecs = {}
    angles = {}
    for label in occurrences:
        ia, va = vectorize(label)
        vecs[label] = (ia, va)
        angles[label] = angle_of_id(ia, va)
    return occurrences, vecs, angles


def check_lexicon_build(con, sf_dir, spark_parquet):
    """Full value check of the lexicon_build dump: the (angle, label) rows
    must be exactly one row per distinct angle, each carrying a label that
    maps to that angle, with the angle list matching the Python port's
    bit-for-bit. Returns (ok, detail)."""
    occurrences, _vecs, angles = _token_angles(con, sf_dir)
    by_angle = {}
    for label, a in angles.items():
        by_angle.setdefault(a, set()).add(label)
    got = con.execute(
        f"SELECT angle, label FROM '{spark_parquet}' ORDER BY angle").fetchall()
    exp_angles = sorted(by_angle)
    got_angles = [a for a, _ in got]
    if got_angles != exp_angles:
        ng, ne = len(got_angles), len(exp_angles)
        sg, se = set(got_angles), set(exp_angles)
        extra = sorted(sg - se)[:3]
        miss = sorted(se - sg)[:3]
        return False, (f"angle sets differ: {ng} spark vs {ne} python; "
                       f"spark-only {extra}, python-only {miss}")
    for a, label in got:
        if label not in by_angle[a]:
            return False, (f"angle {a!r} carries label {label!r}, "
                           f"expected one of {sorted(by_angle[a])}")
    return True, f"{len(got)} angles, {len(angles)} labels"


def check_lexicon_validate(con, sf_dir, spark_parquet):
    """Full value check of the lexicon_validate single-row report, by
    replaying the build+validate round-trip: first-writer-wins per angle is
    engine-nondeterministic, so the stored-vs-fresh cosine is checked
    against the SET of possible stored vectors per angle (collisions and
    min_mutual are exact when every angle has one label — asserted)."""
    occurrences, vecs, angles = _token_angles(con, sf_dir)
    by_angle = {}
    for label, a in angles.items():
        by_angle.setdefault(a, set()).add(label)
    multi = {a: ls for a, ls in by_angle.items() if len(ls) > 1}
    if multi:
        # nondeterministic dropDuplicates winner — fall back to the
        # deterministic subset of the check
        return False, f"angle collisions present ({len(multi)}) — ambiguous"
    total = sum(occurrences.values())
    # every label self-validates: stored == fresh, cosineSparse(v, v)
    min_mutual = 1.0
    collisions = 0
    for label, (ia, va) in vecs.items():
        m = cosine_sparse(ia, va, ia, va)
        if m < 0.9:
            collisions += occurrences[label]
        if m < min_mutual:
            min_mutual = m
    row = con.execute(f"SELECT ok, total_tokens, missing, collisions, "
                      f"min_mutual FROM '{spark_parquet}'").fetchall()
    if len(row) != 1:
        return False, f"expected 1 report row, got {len(row)}"
    ok, tot, missing, coll, mm = row[0]
    if not ok or missing != 0:
        return False, f"spark reports ok={ok} missing={missing}"
    if tot != total:
        return False, f"total_tokens {tot} != python {total}"
    if coll != collisions:
        return False, f"collisions {coll} != python {collisions}"
    if repr(float(mm)) != repr(float(min_mutual)):
        return False, f"min_mutual {mm!r} != python {min_mutual!r}"
    return True, f"{total} tokens, min_mutual {min_mutual}"

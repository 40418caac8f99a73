"""Optional semantic (hypernym-distance) term for schema matching.

Reference: VirtuosoImporter.calculateAsymmetricRelationshipOperation +
scanSense
(/root/reference/fagi-gis/src/main/java/gr/athenainnovation/imis/fusion/gis/virtuoso/VirtuosoImporter.java:1936-2050),
combined into the pair score at :950 as
``(semantic + jaro_norm + 0.5*same_type) / 3``. Defaults
``maxParentDepth=4``, ``raiseToPower=1.0`` (:182-183).

The reference loads the WordNet dictionary through JWNL; no such corpus
ships in this sandbox, so the taxonomy is injected: ``MiniWordNet`` takes
{lemma: [synset ids]} plus {synset id: [hypernym ids]} — tests bundle a
small fixture, and a real WordNet export can be loaded into the same two
dicts. When no taxonomy is supplied the schema matcher keeps its
JW+type-only scoring (the engine's documented default).

Word-pair score, replicating the reference exactly:
* equal lemmas -> 1.0
* else min over sense pairs of the common-parent index (hypernym hops
  from the A-sense to the deepest common ancestor, JWNL's
  AsymmetricRelationship.getCommonParentIndex)
* min == 0 or min > maxParentDepth -> 0.0
* else (1 - min/(maxParentDepth+1)) ** raiseToPower
"""

from __future__ import annotations


class MiniWordNet:
    def __init__(self, senses: dict[str, list[str]], hypernyms: dict[str, list[str]]):
        self.senses = {k.lower(): list(v) for k, v in senses.items()}
        self.hypernyms = {k: list(v) for k, v in hypernyms.items()}

    def ancestors(self, syn: str) -> dict[str, int]:
        """{ancestor synset: min hop count from syn} (syn itself at 0)."""
        out = {syn: 0}
        frontier = [syn]
        while frontier:
            nxt = []
            for s in frontier:
                for h in self.hypernyms.get(s, []):
                    d = out[s] + 1
                    if h not in out or d < out[h]:
                        out[h] = d
                        nxt.append(h)
            frontier = nxt
        return out

    def common_parent_index(self, syn_a: str, syn_b: str) -> int | None:
        """Hops from syn_a up to the closest common ancestor (the JWNL
        common-parent index of the A-side path), None if unrelated."""
        anc_a = self.ancestors(syn_a)
        anc_b = self.ancestors(syn_b)
        common = set(anc_a) & set(anc_b)
        if not common:
            return None
        return min(anc_a[c] for c in common)


def semantic_word_score(
    a: str,
    b: str,
    wn: MiniWordNet,
    max_parent_depth: int = 4,
    power: float = 1.0,
) -> float:
    a, b = a.lower(), b.lower()
    if a == b:
        return 1.0
    sa = wn.senses.get(a, [])
    sb = wn.senses.get(b, [])
    if not sa or not sb:
        return 0.0
    best: int | None = None
    for i in sa:
        for j in sb:
            cpi = wn.common_parent_index(i, j)
            if cpi is None or cpi > max_parent_depth:
                continue  # scanSense returns -1 above maxParentDepth
            if best is None or cpi < best:
                best = cpi
    if best is None or best == 0 or best > max_parent_depth:
        return 0.0
    return (1.0 - best / float(max_parent_depth + 1)) ** power


def semantic_chain_score(
    words_a: list[str],
    words_b: list[str],
    wn: MiniWordNet,
    max_parent_depth: int = 4,
    power: float = 1.0,
) -> float:
    """Chain-pair semantic score: sum over the word cross product divided
    by |A|x|B| (scanMatches: score / (indexes.size() * indexes.size()))."""
    if not words_a or not words_b:
        return 0.0
    total = sum(
        semantic_word_score(wa, wb, wn, max_parent_depth, power)
        for wa in words_a
        for wb in words_b
    )
    return total / (len(words_a) * len(words_b))


def load_wordnet_dict(index_path: str, data_path: str) -> MiniWordNet:
    """Load a real WordNet database-file export into MiniWordNet.

    Reads the standard Princeton ``wndb`` format — the same ``dict/``
    files JWNL points at in the reference's ``file_properties.xml``
    (VirtuosoImporter.java:171-183 initializes JWNL over the WordNet
    dictionary): ``index.<pos>`` maps lemma -> synset offsets,
    ``data.<pos>`` carries per-synset pointers, of which ``@`` (hypernym)
    and ``@i`` (instance hypernym) build the hypernym graph. Format per
    wndb(5WN):

    * index line:  ``lemma pos synset_cnt p_cnt [ptr...] sense_cnt
      tagsense_cnt offset [offset...]`` — the trailing ``synset_cnt``
      offsets are the senses, most-frequent first.
    * data line:   ``offset lex_filenum ss_type w_cnt word lex_id ...
      p_cnt [ptr_symbol offset pos source/target]... | gloss``.

    Lemmas are stored with ``_`` for spaces (kept verbatim: the schema
    matcher tokenizes property names the same way before lookup, and
    lookups are lower-cased by MiniWordNet).
    """
    senses: dict[str, list[str]] = {}
    with open(index_path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("  ") or not line.strip():
                continue  # license header lines start with two spaces
            parts = line.split()
            lemma, _pos, synset_cnt = parts[0], parts[1], int(parts[2])
            senses[lemma] = parts[-synset_cnt:]
    hypernyms: dict[str, list[str]] = {}
    with open(data_path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("  ") or not line.strip():
                continue
            body = line.split("|", 1)[0].split()
            offset = body[0]
            w_cnt = int(body[3], 16)  # w_cnt is HEX per wndb(5WN)
            i = 4 + 2 * w_cnt  # skip (word, lex_id) pairs
            p_cnt = int(body[i])
            i += 1
            hyps = []
            for _ in range(p_cnt):
                sym, tgt = body[i], body[i + 1]
                if sym in ("@", "@i"):
                    hyps.append(tgt)
                i += 4  # pointer_symbol, synset_offset, pos, source/target
            if hyps:
                hypernyms[offset] = hyps
    return MiniWordNet(senses, hypernyms)

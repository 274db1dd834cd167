"""Text-analysis and signature kernels."""

import numpy as np

from credit_ocr_backend_ray.functions.hashing import (
    hamming64, jaccard, minhash_bands, minhash_signature, sha256_hex,
    simhash64, word_shingles,
)
from credit_ocr_backend_ray.functions.textstats import (
    char_stats, fingerprint_md5, lang_id, quality_score, rolling_fingerprint,
    token_count,
)


def test_token_count():
    assert token_count("  a b\tc\nd ") == 4
    assert token_count("") == 0
    assert token_count("   ") == 0


def test_char_stats():
    n, d, u, p = char_stats("Ab1! x")
    assert (n, d, u, p) == (6, 1, 1, 1)


def test_quality_score_bounds():
    assert 0.0 <= quality_score("") <= 1.0
    good = "the quick brown fox jumps over the lazy dog " * 5
    assert quality_score(good) > quality_score("1234 5678 9012 3456")


def test_lang_id():
    assert lang_id("the cat and the dog are in the house") == "en"
    assert lang_id("der Hund und die Katze sind nicht im Haus") == "de"
    assert lang_id("le chat est dans la maison pour le jour") == "fr"
    assert lang_id("el perro y el gato en la casa") == "es"
    assert lang_id("这是中文文本") == "zh"
    assert lang_id("") == "und"


def test_fingerprints_deterministic():
    assert fingerprint_md5("  A  b ") == fingerprint_md5("a B")  # normalized
    assert rolling_fingerprint("a b c d e f g h i j") == \
        rolling_fingerprint("a b c d e f g h i j")
    assert rolling_fingerprint("short") != 0


def test_sha256_matches_known():
    assert sha256_hex("a") == (
        "ca978112ca1bbdcafac231b39a23dc4da786eff8147c4e72b9807785afee48bb")


def test_shingles_and_jaccard():
    assert word_shingles("a b c d", 3) == ["a b c", "b c d"]
    assert word_shingles("a b", 3) == ["a b"]
    assert word_shingles("", 3) == []
    assert jaccard("a b c d", "a b c d") == 1.0
    assert jaccard("a b c d e", "x y z w v") == 0.0


def test_minhash_similarity_correlates():
    base = " ".join(f"tok{i}" for i in range(100))
    near = " ".join(f"tok{i}" for i in range(98))  # drop 2 tokens
    far = " ".join(f"other{i}" for i in range(100))
    s0, s1, s2 = (minhash_signature(t) for t in (base, near, far))
    sim_near = float(np.mean(s0 == s1))
    sim_far = float(np.mean(s0 == s2))
    assert sim_near > 0.8
    assert sim_far < 0.1
    # near-dups share at least one LSH band
    assert set(minhash_bands(s0)) & set(minhash_bands(s1))


def test_simhash_hamming():
    base = " ".join(f"tok{i}" for i in range(100))
    near = " ".join(f"tok{i}" for i in range(99))
    far = " ".join(f"other{i}" for i in range(100))
    assert hamming64(simhash64(base), simhash64(near)) <= 6
    assert hamming64(simhash64(base), simhash64(far)) > 10
    assert simhash64(base) == simhash64(base)

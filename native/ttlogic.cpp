// ttlogic: native logic engine for the truth-table compiler.
//
// Replaces the reference's sympy SOPform/POSform Quine-McCluskey
// (models/TT_FHE_SMALL.py:414-431), which is limited to n in {4, 8, 9} and
// collapses beyond ~12 variables.  This implementation handles n up to 24:
//   * prime-implicant generation by iterative pairwise merging (QMC), with
//     hash-deduplication per popcount class;
//   * greedy essential-first set cover (espresso-style heuristic, not
//     guaranteed minimum but near-minimal and fast);
//   * a packed 1-bit truth-table evaluator for verification and host-side
//     LUT inference.
//
// C ABI only (called from Python via ctypes).

#include <cstdint>
#include <cstring>
#include <unordered_set>
#include <vector>

namespace {

struct Implicant {
    uint32_t value;  // fixed bit values (at positions where mask == 0)
    uint32_t mask;   // 1 = don't care
    bool operator==(const Implicant& o) const {
        return value == o.value && mask == o.mask;
    }
};

struct ImplicantHash {
    size_t operator()(const Implicant& i) const {
        return (size_t)i.value * 1000003u ^ (size_t)i.mask;
    }
};

// Generate prime implicants of the given minterm set.
std::vector<Implicant> prime_implicants(
        const std::vector<uint32_t>& minterms, int n) {
    std::unordered_set<Implicant, ImplicantHash> current;
    for (uint32_t m : minterms) current.insert({m, 0});

    std::vector<Implicant> primes;
    while (!current.empty()) {
        // bucket by popcount of value bits outside the mask
        std::vector<std::vector<Implicant>> buckets(n + 1);
        for (const auto& imp : current) {
            int pc = __builtin_popcount(imp.value & ~imp.mask);
            buckets[pc].push_back(imp);
        }
        std::unordered_set<Implicant, ImplicantHash> next;
        std::unordered_set<Implicant, ImplicantHash> merged;
        for (int pc = 0; pc < n; ++pc) {
            for (const auto& a : buckets[pc]) {
                for (const auto& b : buckets[pc + 1]) {
                    if (a.mask != b.mask) continue;
                    uint32_t diff = (a.value ^ b.value) & ~a.mask;
                    if (__builtin_popcount(diff) != 1) continue;
                    Implicant m{a.value & ~diff, a.mask | diff};
                    next.insert(m);
                    merged.insert(a);
                    merged.insert(b);
                }
            }
        }
        for (const auto& imp : current)
            if (!merged.count(imp)) primes.push_back(imp);
        current = std::move(next);
    }
    return primes;
}

// Greedy largest-coverage-first set cover over precomputed coverage
// bitsets (uint64 blocks) — O(primes * minterms / 64) per pick.
std::vector<Implicant> greedy_cover(const std::vector<Implicant>& primes,
                                    const std::vector<uint32_t>& minterms) {
    const size_t nm = minterms.size();
    const size_t nblocks = (nm + 63) / 64;
    auto covers = [](const Implicant& p, uint32_t m) {
        return ((m ^ p.value) & ~p.mask) == 0;
    };
    std::vector<std::vector<uint64_t>> cov(
        primes.size(), std::vector<uint64_t>(nblocks, 0));
    for (size_t pi = 0; pi < primes.size(); ++pi)
        for (size_t mi = 0; mi < nm; ++mi)
            if (covers(primes[pi], minterms[mi]))
                cov[pi][mi >> 6] |= 1ull << (mi & 63);

    std::vector<uint64_t> uncovered(nblocks, ~0ull);
    if (nm & 63) uncovered[nblocks - 1] = (1ull << (nm & 63)) - 1;
    size_t remaining = nm;
    std::vector<Implicant> chosen;
    while (remaining > 0) {
        int best = -1;
        size_t best_count = 0;
        for (size_t pi = 0; pi < primes.size(); ++pi) {
            size_t cnt = 0;
            for (size_t b = 0; b < nblocks; ++b)
                cnt += (size_t)__builtin_popcountll(cov[pi][b]
                                                    & uncovered[b]);
            if (cnt > best_count) {
                best_count = cnt;
                best = (int)pi;
            }
        }
        if (best < 0) break;  // should not happen
        chosen.push_back(primes[best]);
        for (size_t b = 0; b < nblocks; ++b)
            uncovered[b] &= ~cov[best][b];
        remaining -= best_count;
    }
    return chosen;
}

}  // namespace

extern "C" {

// Minimize a boolean function of n variables given by its minterm list.
// Output: out_terms gets up to max_terms (value, mask) uint32 pairs;
// returns the number of terms written, or -1 on error/overflow.
int ttlogic_minimize(int n, const uint32_t* minterms, int n_minterms,
                     uint32_t* out_terms, int max_terms) {
    if (n <= 0 || n > 24 || n_minterms <= 0) return -1;
    std::vector<uint32_t> mts(minterms, minterms + n_minterms);
    auto primes = prime_implicants(mts, n);
    auto chosen = greedy_cover(primes, mts);
    if ((int)chosen.size() > max_terms) return -1;
    for (size_t i = 0; i < chosen.size(); ++i) {
        out_terms[2 * i] = chosen[i].value;
        out_terms[2 * i + 1] = chosen[i].mask;
    }
    return (int)chosen.size();
}

// Evaluate a packed 1-bit truth table at the given indices.
// table: bit i of table[i / 8] (little-endian within the byte).
void ttlogic_eval_packed(const uint8_t* table, const uint32_t* indices,
                         int n_indices, uint8_t* out) {
    for (int i = 0; i < n_indices; ++i) {
        uint32_t idx = indices[i];
        out[i] = (table[idx >> 3] >> (idx & 7)) & 1;
    }
}

// Pack a float/byte 0-1 table column into bits.
void ttlogic_pack_bits(const uint8_t* values, int n, uint8_t* out) {
    std::memset(out, 0, (n + 7) / 8);
    for (int i = 0; i < n; ++i)
        if (values[i]) out[i >> 3] |= (uint8_t)(1u << (i & 7));
}

// Count DNF gates of a term list: per term, (#fixed bits - 1) ANDs +
// #negated-literal NOTs; plus (#terms - 1) ORs.
long ttlogic_count_gates(const uint32_t* terms, int n_terms, int n) {
    if (n_terms <= 0) return 0;
    long gates = n_terms - 1;  // ORs
    for (int i = 0; i < n_terms; ++i) {
        uint32_t value = terms[2 * i], mask = terms[2 * i + 1];
        int fixed = 0, nots = 0;
        for (int b = 0; b < n; ++b) {
            if ((mask >> b) & 1) continue;
            ++fixed;
            if (!((value >> b) & 1)) ++nots;
        }
        if (fixed > 1) gates += fixed - 1;  // ANDs
        gates += nots;
    }
    return gates;
}

}  // extern "C"

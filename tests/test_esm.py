"""ESM-2 sequence formatting and token-alignment tests.

Validates ``build_chain_separated_sequence`` (chain joining with a 20-token
``<pad>`` run, ``<mask>`` insertion) and ``residue_keep_indices`` (the
embedding-row selection) against a deterministic fake tokenizer that
reproduces the real ESM tokenizer's behavior: one token per amino-acid
character, one token per ``<pad>``/``<mask>`` special, cls/eos wrapping
(reference: src/datamodules/components/helper.py:131-169).
"""
import re

import numpy as np
import pytest

from packppi_tpu.chem import RESTYPES
from packppi_tpu.data.esm import (
    _PAD_RUN,
    build_chain_separated_sequence,
    chain_grouped_order,
    residue_keep_indices,
)

_TOKEN_RE = re.compile(r"<pad>|<mask>|.")


def esm_tokenize(seq: str) -> list[str]:
    """Real-ESM-like tokenization: specials are single tokens, everything
    else character-level; cls/eos added."""
    return ["<cls>", *_TOKEN_RE.findall(seq), "<eos>"]


def _restype_indices(seq_1letter: str) -> np.ndarray:
    return np.array([RESTYPES.index(a) for a in seq_1letter], np.int64)


class TestBuildSequence:
    def test_single_chain_no_pads(self):
        rt = _restype_indices("ACDEFG")
        seq = build_chain_separated_sequence(rt, np.zeros(6, np.int64))
        assert seq == "ACDEFG"

    def test_two_chains_joined_by_20_pads(self):
        rt = _restype_indices("ACDKLM")
        chains = np.array([0, 0, 0, 1, 1, 1])
        seq = build_chain_separated_sequence(rt, chains)
        assert seq == "ACD" + "<pad>" * _PAD_RUN + "KLM"

    def test_three_chains_two_pad_runs(self):
        rt = _restype_indices("ACDKLMNP")
        chains = np.array([0, 0, 0, 1, 1, 1, 2, 2])
        seq = build_chain_separated_sequence(rt, chains)
        assert seq.count("<pad>") == 2 * _PAD_RUN
        assert seq == "ACD" + "<pad>" * _PAD_RUN + "KLM" + "<pad>" * _PAD_RUN + "NP"

    def test_mask_positions(self):
        rt = _restype_indices("ACDKLM")
        chains = np.array([0, 0, 0, 1, 1, 1])
        mask = np.array([0, 1, 0, 0, 0, 1], bool)
        seq = build_chain_separated_sequence(rt, chains, mask)
        assert seq == "A<mask>D" + "<pad>" * _PAD_RUN + "KL<mask>"

    def test_unknown_restype_becomes_X(self):
        rt = np.array([0, 20], np.int64)  # 20 = beyond the 20 canonical AAs
        seq = build_chain_separated_sequence(rt, np.zeros(2, np.int64))
        assert seq == RESTYPES[0] + "X"


class TestKeepIndices:
    @pytest.mark.parametrize("chain_sizes", [(6,), (3, 3), (4, 2, 5), (1, 1, 1, 1)])
    def test_alignment_against_fake_tokenizer(self, chain_sizes):
        """Each residue's keep-index must land on that residue's own token
        in the cls-stripped token stream."""
        L = sum(chain_sizes)
        letters = ("ACDEFGHIKLMNPQRSTVWY" * 4)[:L]
        rt = _restype_indices(letters)
        chains = np.concatenate(
            [np.full(n, i, np.int64) for i, n in enumerate(chain_sizes)])
        seq = build_chain_separated_sequence(rt, chains)
        tokens = esm_tokenize(seq)
        body = tokens[1:-1]  # what reps[0, 1:-1] spans

        keep = residue_keep_indices(chains)
        assert len(keep) == L
        recovered = "".join(body[k] for k in keep)
        assert recovered == letters
        # and nothing kept is a pad token
        assert all(body[k] != "<pad>" for k in keep)

    def test_reference_slice_is_misaligned_for_multichain(self):
        """Documents the quirk we deliberately fix: the reference keeps
        tokens [1 : L+1] verbatim, which for multi-chain inputs selects the
        inter-chain pad tokens instead of chain-2 residues (reference:
        src/datamodules/components/helper.py:164-166)."""
        rt = _restype_indices("ACDKLM")
        chains = np.array([0, 0, 0, 1, 1, 1])
        seq = build_chain_separated_sequence(rt, chains)
        body = esm_tokenize(seq)[1:-1]
        ref_slice = body[: len(rt)]  # tokens 1..L+1 of the full stream
        assert ref_slice == ["A", "C", "D", "<pad>", "<pad>", "<pad>"]
        ours = [body[k] for k in residue_keep_indices(chains)]
        assert ours == ["A", "C", "D", "K", "L", "M"]

    def test_mask_tokens_still_aligned(self):
        rt = _restype_indices("ACDKLM")
        chains = np.array([0, 0, 0, 1, 1, 1])
        mask = np.array([0, 0, 1, 1, 0, 0], bool)
        seq = build_chain_separated_sequence(rt, chains, mask)
        body = esm_tokenize(seq)[1:-1]
        ours = [body[k] for k in residue_keep_indices(chains)]
        assert ours == ["A", "C", "<mask>", "<mask>", "L", "M"]

    def test_nonmonotonic_chain_indices_realign(self):
        """A residue_mask=0 residue mid-chain becomes chain 0 in featurize
        (chain_indices * residue_mask), which build_chain_separated_sequence
        emits FIRST. reps[keep][chain_grouped_order-inverse] must still give
        row i == residue i — the extract() contract this regression locks
        (every residue after the masked one used to receive its neighbor's
        embedding)."""
        rt = _restype_indices("ACDKLM")
        # featurize output for chains [1,1,1,2,2,2] with residue 2 masked
        chains = np.array([1, 1, 0, 2, 2, 2])
        seq = build_chain_separated_sequence(rt, chains)
        body = esm_tokenize(seq)[1:-1]
        # emitted order: the chain-0 'D' first, then AC, then KLM
        assert "".join(t for t in body if t != "<pad>") == "DACKLM"
        keep = residue_keep_indices(chains)
        perm = chain_grouped_order(chains)
        out = [None] * len(rt)
        for dst, k in zip(perm, keep):
            out[dst] = body[k]
        assert out == ["A", "C", "D", "K", "L", "M"]

"""Model zoo: the reference's eight truncation models + probe/task modules
(reference models/__init__.py:1-12), with a registry used by the trainer."""

from rlt_tpu.models.layers import (  # noqa: F401
    LSTM,
    SelfAttention,
    TorchLinear,
    TowerClass,
    TowerCut,
    TowerRerank,
    TransformerEncoder,
    TransformerEncoderLayer,
)
from rlt_tpu.models.simple import AttnCut, BiCut, Choopy  # noqa: F401
from rlt_tpu.models.multitask import MtAttnCut, MtChoopy  # noqa: F401
from rlt_tpu.models.mmoe import Expert, MMOECut, MOECut, PLECut  # noqa: F401
from rlt_tpu.models.probe import Probe, ProbeBase, TaskC, TaskR  # noqa: F401

MODELS = {
    "bicut": BiCut,
    "choopy": Choopy,
    "attncut": AttnCut,
    "mtchoopy": MtChoopy,
    "mtattncut": MtAttnCut,
    "mmoecut": MMOECut,
    "moecut": MOECut,
    "mtple": PLECut,
    "probe_base": ProbeBase,
}

# Models whose apply() returns a list of task heads, decoded from the LAST
# head (the cut tower). The reference keys this on `"m" in model_name`
# (run.py:137) — correct for its eight names but a silent-misroute trap for
# any added model, so here it is an explicit registry attribute.
MULTI_HEAD = frozenset(
    {"mtchoopy", "mtattncut", "mmoecut", "moecut", "mtple"})


def is_multi_head(name: str) -> bool:
    """True when `name`'s forward output is a list of heads (run.py:137)."""
    if name not in MODELS:
        raise ValueError(f"unknown model: {name!r}")
    return name in MULTI_HEAD


def build_model(name: str, *, seq_len: int, input_size: int, dropout: float,
                num_tasks: float = 3, use_pallas: bool = False):
    """Model dispatch mirroring run.py:59-102 constructor arguments."""
    if name == "bicut":
        return BiCut(input_size=input_size, dropout=dropout,
                     use_pallas=use_pallas)
    if name == "choopy":
        return Choopy(seq_len=seq_len, dropout=dropout, use_pallas=use_pallas)
    if name == "attncut":
        return AttnCut(input_size=input_size, dropout=dropout, use_pallas=use_pallas)
    if name == "mtchoopy":
        return MtChoopy(seq_len=seq_len, num_tasks=num_tasks, dropout=dropout,
                        use_pallas=use_pallas)
    if name == "mtattncut":
        return MtAttnCut(input_size=input_size, num_tasks=num_tasks, dropout=dropout,
                         use_pallas=use_pallas)
    if name == "mmoecut":
        return MMOECut(seq_len=seq_len, num_tasks=num_tasks, input_size=input_size,
                       dropout=dropout, num_experts=3, use_pallas=use_pallas)
    if name == "moecut":
        return MOECut(seq_len=seq_len, num_tasks=num_tasks, input_size=input_size,
                      dropout=dropout, use_pallas=use_pallas)
    if name == "mtple":
        return PLECut(seq_len=seq_len, input_size=input_size, dropout=dropout,
                      num_experts=3, use_pallas=use_pallas)
    if name == "probe_base":
        return ProbeBase(seq_len=seq_len, input_size=input_size, dropout=dropout,
                         num_experts=2, use_pallas=use_pallas)
    raise ValueError(f"unknown model: {name!r}")

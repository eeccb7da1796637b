"""Agentic GRPO: multi-turn tool-calling rollouts trained with GRPO.

Run: python examples/agentic/main_agent_grpo.py
Reference analog: examples/reasoning agentic configs + AgentLoopWorker.
"""

from rlinf_tpu.agents import AgentLoopConfig, CalculatorTool, ToolRegistry
from rlinf_tpu.config import AlgorithmConfig, RunnerConfig, TrainerConfig
from rlinf_tpu.data.datasets import PromptDataset, PromptExample
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams
from rlinf_tpu.runners.agent_runner import AgentRunner
from rlinf_tpu.training.train_state import OptimizerConfig


def main():
    cfg = TrainerConfig(
        model=LLMConfig.tiny(vocab_size=258, max_seq_len=512),
        sampling=SamplingParams(max_new_tokens=24, eos_token_id=-1),
        optimizer=OptimizerConfig(lr=1e-4),
        algorithm=AlgorithmConfig(adv_type="grpo", group_size=4),
        runner=RunnerConfig(rollout_batch_size=4, max_steps=20,
                            log_dir="logs/agent_demo"),
    )
    dataset = PromptDataset(
        [PromptExample(f"compute {i}+{i}: ", str(2 * i)) for i in range(32)])
    runner = AgentRunner(
        cfg, ByteTokenizer(), dataset,
        tools=ToolRegistry([CalculatorTool()]),
        reward_fn=lambda texts, answers: [
            1.0 if a in t else 0.0 for t, a in zip(texts, answers)],
        loop_cfg=AgentLoopConfig(max_turns=2, max_total_len=256),
    )
    runner.run()


if __name__ == "__main__":
    main()

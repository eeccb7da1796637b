"""Agentic RL: tools and the multi-turn rollout loop (reference: rlinf/agents/
+ rlinf/workers/agent/)."""

from rlinf_tpu.agents.tools import Tool, ToolRegistry, CalculatorTool, EchoTool
from rlinf_tpu.agents.agent_loop import AgentLoop, AgentLoopConfig, AgentRollout

__all__ = [
    "Tool",
    "ToolRegistry",
    "CalculatorTool",
    "EchoTool",
    "AgentLoop",
    "AgentLoopConfig",
    "AgentRollout",
]

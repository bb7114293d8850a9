"""Tick-counted sim-time clock (reference: deploy/utils/timer.py:15-19).

In simulation (Webots/mock) time advances with received low-state messages
rather than wall clock, so the controller replays deterministically."""

from dataclasses import dataclass
from typing import Optional


@dataclass
class TimerConfig:
    time_step: float = 0.002


class Timer:
    def __init__(self, config: Optional[TimerConfig] = None):
        self.config = config or TimerConfig()
        self.counter = 0

    def tick_timer_if_sim(self):
        self.counter += 1

    def get_time(self):
        return self.counter * self.config.time_step

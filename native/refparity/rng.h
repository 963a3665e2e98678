// Shadowed replacement for the reference's src/rng.h, used ONLY by the
// parity harness build (native/refparity/Makefile places this file ahead
// of the real one in a symlink shadow tree).  Same API as the reference
// singleton (reference: src/rng.h:23-47) with two additions:
//   * every draw is recorded into a trace (kind, value) so the Python
//     side can feed the exact same dice into the JAX engine's explicit
//     `step(state, action, dice)`;
//   * the engine is seedable from the C ABI for reproducible games.
#pragma once

#include <cstdint>
#include <random>
#include <vector>

class Rng
{
	std::default_random_engine RNG_ENGINE;

	std::uniform_int_distribution<int> RNG_INT;
	std::uniform_int_distribution<int> RNG_DICE;
	std::uniform_real_distribution<float> RNG_FLOAT;

	Rng()
	{
		RNG_ENGINE = std::default_random_engine(12345u);

		RNG_INT = std::uniform_int_distribution<int>(0, RAND_MAX);
		RNG_DICE = std::uniform_int_distribution<int>(1, 6);
		RNG_FLOAT = std::uniform_real_distribution<float>(0.0, 1.0);
	}

public:
	// draw trace: pairs of (kind, value); kind 0=rInt, 1=rDice, 2=rFloat
	std::vector<int32_t> trace;

	int rInt()
	{
		int v = RNG_INT(RNG_ENGINE);
		trace.push_back(0);
		trace.push_back(v);
		return v;
	}

	int rDice()
	{
		int v = RNG_DICE(RNG_ENGINE);
		trace.push_back(1);
		trace.push_back(v);
		return v;
	}

	float rFloat()
	{
		float v = RNG_FLOAT(RNG_ENGINE);
		trace.push_back(2);
		trace.push_back(static_cast<int32_t>(v * 1000000000.0f));
		return v;
	}

	static Rng& getInstance()
	{
		static Rng INSTANCE;
		return INSTANCE;
	}

	std::default_random_engine& getEngine()
	{
		return RNG_ENGINE;
	}

	void seed(uint64_t s)
	{
		RNG_ENGINE.seed(static_cast<unsigned>(s));
	}
};

static Rng& RNG = Rng::getInstance();

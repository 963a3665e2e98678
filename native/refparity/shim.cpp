// C-ABI shim over the REFERENCE rules engine, compiled unmodified from
// /root/reference/src (state.cpp, land.cpp, alphazero_moves.cpp, ...)
// through a symlink shadow tree that swaps in a recording rng.h.
//
// Purpose (BASELINE.md north star): prove the JAX engine's transitions are
// trajectory-exact against the REAL reference code — not against
// builder-written oracles.  The harness drives State::newGame /
// UtilityNN::getValidMoves / UtilityNN::makeMove
// (reference: state.cpp:137-167, alphazero_moves.cpp:3-243) with a seeded
// engine, records every RNG draw, and exports full state snapshots; the
// Python side replays the identical (action, dice) stream through
// alphazero_risk_tpu.env.rules.step and diffs field-wise.
//
// Build: make -C native/refparity   (see Makefile; nothing from the
// reference tree is copied into the repo — sources are symlinked at
// build time and the artifacts are gitignored).

#include <cstdint>
#include <cstring>
#include <exception>
#include <string>

#include "shadow/src/risk_game/player/alpha_zero/alphazero_moves.h"
#include "shadow/src/risk_game/state/state.h"

static std::string g_last_error;

extern "C" {

void* ref_new_game(uint64_t seed)
{
    RNG.seed(seed);
    RNG.trace.clear();
    State* st = new State();
    st->newGame();
    return st;
}

void ref_free(void* p) { delete static_cast<State*>(p); }

void ref_seed(uint64_t seed) { RNG.seed(seed); }

// Snapshot layout (int64): see PyRefState in tests/refparity.py
// 0..41 owner, 42..83 army, then scalars, then per-player bitmasks.
void ref_export(void* p, int64_t* out)
{
    const State* st = static_cast<State*>(p);
    const Data& d = st->getData();
    for (int i = 0; i < DATA_TERRITORY; i++) {
        out[i] = d.landArmy[i].playerIndex;
        out[42 + i] = d.landArmy[i].army;
    }
    out[84] = d.round;
    out[85] = d.currentPlayerTurn;
    out[86] = d.cardSetsPlayed;
    out[87] = d.reinforcements;
    out[88] = static_cast<int64_t>(d.roundPhase);
    out[89] = static_cast<int64_t>(d.attackMobilizationFrom);
    out[90] = static_cast<int64_t>(d.attackMobilizationTo);
    out[91] = d.playerAllowedDrawCard ? 1 : 0;
    out[92] = d.attacksDuringTurn;
    out[93] = static_cast<int64_t>(d.playerStatus[0].playerCards);
    out[94] = static_cast<int64_t>(d.playerStatus[1].playerCards);
    out[95] = d.playerStatus[0].totalArmy;
    out[96] = d.playerStatus[1].totalArmy;
    out[97] = static_cast<int64_t>(d.drawnCardsBitMask);
    for (int pl = 0; pl < 2; pl++) {
        const PlayerStatus& ps = d.playerStatus[pl];
        int64_t* m = out + 98 + pl * 5;
        m[0] = static_cast<int64_t>(ps.ownedLands);
        m[1] = static_cast<int64_t>(ps.ownedLandsWithArmy);
        m[2] = static_cast<int64_t>(ps.ownedFullLands);
        m[3] = static_cast<int64_t>(ps.attackLands);
        m[4] = static_cast<int64_t>(ps.attackLandsWithArmy);
    }
    out[108] = st->gameStatus();
}

uint64_t ref_legal_mask(void* p)
{
    return UtilityNN::getValidMoves(*static_cast<State*>(p));
}

int ref_game_status(void* p)
{
    return static_cast<State*>(p)->gameStatus();
}

// Executes one 43-way action.  Fills draws_out with the recorded
// (kind, value) pairs the move consumed (kind 0=rInt, 1=rDice, 2=rFloat
// scaled by 1e9); returns the number of PAIRS, or -1 on a rules
// exception (message via ref_last_error).
int ref_make_move(void* p, int action, int32_t* draws_out, int cap)
{
    State* st = static_cast<State*>(p);
    RNG.trace.clear();
    try {
        UtilityNN::makeMove(*st, static_cast<LandIndex>(action));
    } catch (const std::exception& e) {
        g_last_error = e.what();
        return -1;
    }
    int n = static_cast<int>(RNG.trace.size() / 2);
    int m = n < cap ? n : cap;
    std::memcpy(draws_out, RNG.trace.data(),
                sizeof(int32_t) * 2 * static_cast<size_t>(m));
    return n;
}

const char* ref_last_error() { return g_last_error.c_str(); }

void ref_set_current_player(void* p, int player)
{
    static_cast<State*>(p)->setCurrentPlayerTurn(
        static_cast<int8_t>(player));
}

void ref_invert_players(void* p)
{
    static_cast<State*>(p)->invertPlayers();
}

void ref_consistency_check(void* p)
{
    static_cast<State*>(p)->consistencyCheck();
    static_cast<State*>(p)->consistencyCheckArmyValue();
}

}  // extern "C"

#include "pgcar/steering_commands.h"

#include <cstring>

#include "pgcar/testing.h"

using pgcar::kia::KiaControlCommand;
using pgcar::kia::KiaControlCommandProcessor;

TEST(TryParse, SteerCommands) {
  KiaControlCommand command;
  EXPECT_TRUE(KiaControlCommand::TryParse("s42", &command));
  EXPECT_EQ(command.type, KiaControlCommand::STEER);
  EXPECT_EQ(command.value, 42);

  EXPECT_TRUE(KiaControlCommand::TryParse("s-17", &command));
  EXPECT_EQ(command.value, -17);

  EXPECT_TRUE(KiaControlCommand::TryParse("s0", &command));
  EXPECT_EQ(command.value, 0);

  EXPECT_TRUE(KiaControlCommand::TryParse("s32767", &command));
  EXPECT_EQ(command.value, 32767);
  EXPECT_TRUE(KiaControlCommand::TryParse("s-32768", &command));
  EXPECT_EQ(command.value, -32768);
}

TEST(TryParse, RejectsMalformed) {
  KiaControlCommand command;
  EXPECT_FALSE(KiaControlCommand::TryParse("", &command));
  EXPECT_FALSE(KiaControlCommand::TryParse("s", &command));    // missing value
  EXPECT_FALSE(KiaControlCommand::TryParse("s-", &command));
  EXPECT_FALSE(KiaControlCommand::TryParse("s12x", &command));
  EXPECT_FALSE(KiaControlCommand::TryParse("s40000", &command));  // overflow
  EXPECT_FALSE(KiaControlCommand::TryParse("x5", &command));   // unknown type
  EXPECT_FALSE(KiaControlCommand::TryParse("e1", &command));   // value on e
  EXPECT_FALSE(KiaControlCommand::TryParse("r0", &command));   // value on r
}

TEST(TryParse, NoValueCommands) {
  KiaControlCommand command;
  EXPECT_TRUE(KiaControlCommand::TryParse("e", &command));
  EXPECT_EQ(command.type, KiaControlCommand::ECHO_COMMAND);
  EXPECT_TRUE(KiaControlCommand::TryParse("r", &command));
  EXPECT_EQ(command.type, KiaControlCommand::RESET);
}

TEST(ToString, RoundTrips) {
  char buffer[16];
  KiaControlCommand command{};
  command.type = KiaControlCommand::STEER;
  command.value = -123;
  EXPECT_TRUE(command.ToString(buffer, sizeof(buffer)));
  EXPECT_TRUE(std::strcmp(buffer, "s-123") == 0);

  KiaControlCommand parsed;
  EXPECT_TRUE(KiaControlCommand::TryParse(buffer, &parsed));
  EXPECT_EQ(parsed.type, command.type);
  EXPECT_EQ(parsed.value, command.value);

  command.type = KiaControlCommand::RESET;
  EXPECT_TRUE(command.ToString(buffer, sizeof(buffer)));
  EXPECT_TRUE(std::strcmp(buffer, "r") == 0);
}

TEST(ToString, BufferTooSmall) {
  char tiny[3];
  KiaControlCommand command{};
  command.type = KiaControlCommand::STEER;
  command.value = 1234;
  EXPECT_FALSE(command.ToString(tiny, sizeof(tiny)));
}

TEST(Processor, ParsesCommandStream) {
  KiaControlCommandProcessor processor;
  EXPECT_EQ(processor.GetCommandStatus(), KiaControlCommandProcessor::INCOMPLETE);

  for (const char c : {'s', '5', '7'}) {
    EXPECT_EQ(processor.ConsumeChar(c),
              KiaControlCommandProcessor::INCOMPLETE);
  }
  EXPECT_EQ(processor.ConsumeChar(KiaControlCommandProcessor::kCommandEnd),
            KiaControlCommandProcessor::READY_OK);
  KiaControlCommand command;
  EXPECT_TRUE(processor.GetCurrentCommand(&command));
  EXPECT_EQ(command.type, KiaControlCommand::STEER);
  EXPECT_EQ(command.value, 57);

  EXPECT_TRUE(processor.startNextCommand());
  EXPECT_EQ(processor.GetCommandStatus(),
            KiaControlCommandProcessor::INCOMPLETE);
  EXPECT_FALSE(processor.GetCurrentCommand(&command));
}

TEST(Processor, ParseFailureThenRecovers) {
  KiaControlCommandProcessor processor;
  for (const char c : {'z', '9'}) processor.ConsumeChar(c);
  EXPECT_EQ(processor.ConsumeChar(KiaControlCommandProcessor::kCommandEnd),
            KiaControlCommandProcessor::PARSE_FAIL);
  // Next characters implicitly start a new command.
  processor.ConsumeChar('r');
  EXPECT_EQ(processor.ConsumeChar(KiaControlCommandProcessor::kCommandEnd),
            KiaControlCommandProcessor::READY_OK);
}

TEST(Processor, OverflowReported) {
  KiaControlCommandProcessor processor;
  for (int i = 0; i < 40; ++i) {
    EXPECT_EQ(processor.ConsumeChar('1'),
              KiaControlCommandProcessor::INCOMPLETE);
  }
  EXPECT_EQ(processor.ConsumeChar(KiaControlCommandProcessor::kCommandEnd),
            KiaControlCommandProcessor::COMMAND_OVERFLOW);
  // And recovers afterwards.
  processor.ConsumeChar('e');
  EXPECT_EQ(processor.ConsumeChar(KiaControlCommandProcessor::kCommandEnd),
            KiaControlCommandProcessor::READY_OK);
}

TEST(Processor, StartNextCommandMidStreamIsNoop) {
  KiaControlCommandProcessor processor;
  processor.ConsumeChar('s');
  EXPECT_FALSE(processor.startNextCommand());
}

PGTEST_MAIN()

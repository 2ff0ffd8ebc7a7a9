"""Control plane: process admission queue + graceful stop (reference
control/ProcessScheduler.scala, control/Server.scala)."""

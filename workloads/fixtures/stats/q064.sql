SELECT COUNT(*) FROM users as u, postHistory as ph, badges as b WHERE ph.UserId = u.Id AND b.UserId = u.Id AND u.Reputation>=98 AND u.UpVotes=392;

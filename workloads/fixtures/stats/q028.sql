SELECT COUNT(*) FROM users as u, badges as b WHERE b.UserId = u.Id AND u.Reputation<=891 AND u.UpVotes=300 AND u.DownVotes=4;

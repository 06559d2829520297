SELECT COUNT(*) FROM users as u, comments as c WHERE c.UserId = u.Id AND u.Reputation<=502 AND u.DownVotes<=43;
